package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local Outlier Factor (Breunig et al. 2000) — density-RATIO outlier
  * scoring over the kNN graph: a point is anomalous when its local
  * reachability density is small relative to its neighbours' (global
  * distance thresholds miss outliers sitting next to a dense cluster;
  * LOF is the standard fix). Composes the engine's existing kNN
  * machinery: label-blocked candidates (the [[KnnGraph]] scale path —
  * an equi-shuffle, never n²), bounded
  * [[graft.functions.TopKAgg]] per-node top-k, then three joins over
  * the k·n DIRECTED edge set:
  *
  *   k-dist(o) = d of o's k-th neighbour;
  *   reach(p,o) = max(d(p,o), k-dist(o));
  *   lrd(p) = k / Σ_o reach(p,o);   LOF(p) = mean_o lrd(o) / lrd(p)
  *
  * Determinism: distances are 4-dp-rounded (id tiebreaks at the k
  * boundary), the reach sum is EXACT (decimal(38,4) of 4-dp values),
  * lrd one IEEE divide with a 1e-4 floor (k coincident points would
  * otherwise divide by zero), and the lrd mean goes through a 9-dp
  * decimal cast — every number bit-identical in both engines. Top-20
  * is TakeOrderedAndProject.
  */
object Lof {

  val K = 5
  val TopN = 20

  def lof(embeddings: DataFrame, k: Int = K): DataFrame = {
    val e = SimilarityQueries.withNorm(embeddings)
    val scored = e.alias("a")
      .join(e.alias("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        round(SimilarityQueries.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 4).as("cos"))
    val topk = udaf(new graft.functions.TopKAgg(k))
    // materialisation barrier (r08, guide §2.4/§5): `edges` feeds THREE
    // consumers (kdist, reach, the final lrd_o join) and each re-ran the
    // whole blocked self-join + top-k upstream — the probe showed the
    // 32-task pair-scoring stage executing 5×. One lineage cut computes
    // it once (k·n rows, node-bounded at any scale); measured 1.67 →
    // 0.73 s full-run bench warm at sf0.1, identical output.
    val edges = scored.groupBy("src")
      .agg(topk(col("cos"), col("dst")).as("nn"))
      .select(col("src"), explode(col("nn")).as("e"))
      .select(col("src"), col("e.id").as("dst"),
        round(lit(1.0) - col("e.score"), 4).as("d"))
      .localCheckpoint(false)
    val kdist = edges.groupBy("src").agg(max(col("d")).as("kdist"))
    val reach = edges
      .join(kdist.select(col("src").as("dst"), col("kdist")), "dst")
      .select(col("src"), col("dst"),
        greatest(col("d"), col("kdist")).as("reach"))
    val lrd = reach.groupBy("src")
      .agg(sum(col("reach").cast("decimal(38,4)")).cast("double")
        .as("sum_reach"))
      .select(col("src"),
        (lit(k.toDouble) / greatest(col("sum_reach"), lit(1e-4)))
          .as("lrd"))
    edges
      .join(lrd.select(col("src").as("dst"), col("lrd").as("lrd_o")),
        "dst")
      .groupBy("src")
      .agg(sum(col("lrd_o").cast("decimal(38,9)")).cast("double")
        .as("sum_lrd"))
      .join(lrd, "src")
      .select(col("src").as("vec_id"),
        round(col("lrd"), 6).as("lrd"),
        round(col("sum_lrd") / k.toDouble / col("lrd"), 6).as("lof"))
      .orderBy(col("lof").desc, col("vec_id").asc)
      .limit(TopN)
  }

  private val q = Q(
    "sim_lof_outliers",
    (s, d) => lof(Tables(s, d).embeddings),
    Some(
      s"""WITH scored AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    round(list_cosine_similarity(
         |      a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id),
         |edges AS (
         |  SELECT src, dst, round(1.0 - cos, 4) AS d FROM (
         |    SELECT src, dst, cos,
         |      row_number() OVER (PARTITION BY src
         |                         ORDER BY cos DESC, dst ASC) AS rn
         |    FROM scored)
         |  WHERE rn <= $K),
         |kdist AS (SELECT src, max(d) AS kdist FROM edges GROUP BY 1),
         |reach AS (
         |  SELECT e.src, e.dst, greatest(e.d, k.kdist) AS reach
         |  FROM edges e JOIN kdist k ON e.dst = k.src),
         |lrd AS (
         |  SELECT src,
         |    CAST($K AS DOUBLE) / greatest(
         |      CAST(sum(CAST(reach AS DECIMAL(38,4))) AS DOUBLE),
         |      CAST(0.0001 AS DOUBLE)) AS lrd
         |  FROM reach GROUP BY 1),
         |agg AS (
         |  SELECT e.src,
         |    CAST(sum(CAST(l.lrd AS DECIMAL(38,9))) AS DOUBLE) AS sum_lrd
         |  FROM edges e JOIN lrd l ON e.dst = l.src GROUP BY 1)
         |SELECT a.src AS vec_id, round(l.lrd, 6) AS lrd,
         |  round(a.sum_lrd / CAST($K AS DOUBLE) / l.lrd, 6) AS lof
         |FROM agg a JOIN lrd l ON a.src = l.src
         |ORDER BY lof DESC, vec_id ASC
         |LIMIT $TopN""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
