package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mutual-kNN edge filtering — the INTERSECTION graph (i keeps j only
  * when each ranks the other in its own top-k), versus
  * [[KnnGraph.knnGraph]]'s union semantics. Mutuality is the standard
  * hub-suppression filter before density clustering and manifold
  * methods: a hub lands in thousands of nodes' top-k lists (union keeps
  * every such edge) but its own list holds only k — mutuality caps its
  * degree at k and removes the asymmetric spokes that merge unrelated
  * clusters. One extra self-equi-join on the (|V|·k)-row directed edge
  * list — negligible next to candidate scoring, and composes unchanged
  * over the blocked/IVF candidate generators at fleet scale.
  */
object MutualKnn {

  val K = 5

  /** Directed top-k per src (4-dp cosine, id tie-break), then the
    * mutual intersection as canonical (a < b) edges.
    *
    * The intersection is a GROUP BY over unordered pairs, not a
    * topk⋈topk self-join: the two join branches are alias-distinct
    * subtrees, so the n² scoring pass + window behind `topk` executed
    * TWICE (the sim_lof/a32 duplicated-subtree finding, opt guide
    * §2.4). (src, dst) is unique in `topk`, so an unordered pair holds
    * at most the two orientations: n = 2 ⇔ mutual, and the reported
    * cos is the lower-id orientation's — exactly the old join's
    * x.src < x.dst row. Same rows, same values, one topk build.
    */
  def mutualEdges(embeddings: DataFrame, k: Int): DataFrame = {
    val e = SimilarityQueries.withNorm(embeddings)
    val scored = e.alias("a")
      .join(e.alias("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        round(SimilarityQueries.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 4).as("cos"))
    val w = Window.partitionBy("src").orderBy(desc("cos"), asc("dst"))
    val topk = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("src", "dst", "cos")
    topk
      .groupBy(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .agg(count(lit(1)).as("n_dir"),
        max(when(col("src") < col("dst"), col("cos"))).as("cos"))
      .filter(col("n_dir") === 2)
      .select(col("a"), col("b"), col("cos"))
  }

  private val q = Q(
    "sim_mutual_knn",
    (s, d) => mutualEdges(Tables(s, d).embeddings, K),
    Some(
      s"""WITH scored AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    round(list_cosine_similarity(
         |      a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
         |topk AS (
         |  SELECT src, dst, cos FROM (
         |    SELECT src, dst, cos, row_number() OVER (PARTITION BY src
         |      ORDER BY cos DESC, dst ASC) AS rn
         |    FROM scored) WHERE rn <= $K)
         |SELECT x.src AS a, x.dst AS b, x.cos
         |FROM topk x JOIN topk y ON x.src = y.dst AND x.dst = y.src
         |WHERE x.src < x.dst""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
