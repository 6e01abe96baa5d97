package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation over a kNN graph (Zhu & Ghahramani
  * 2002, the clamped majority-vote form): a fifth of the corpus keeps
  * its known label, every other node takes the MODE of its neighbours'
  * current labels each round (ties → smallest label; no labelled
  * neighbour → stays null), seeds clamped, [[Rounds]] simultaneous
  * rounds. The standard cheap way to extend a small labelled set over a
  * large embedded corpus (weak supervision for quality/domain
  * classifiers) — and deterministic by construction, so the whole
  * propagation replays in SQL.
  *
  * Graph source: the operator takes the edge list as input. The
  * registered row runs on the BRUTE kNN graph (the labelled oracle
  * ceiling, like `sim_knn_graph`); at fleet scale the identical rounds
  * compose onto `ivfKnnGraph` output — each round is one equi-join of
  * edges onto current labels + one (node, label) count + one per-node
  * argmax window, all keyed by node id. BSP like PageRank/k-core,
  * lineage cut per round.
  *
  * NOTE on the synthetic table: its `label` column is geometry-free
  * (within-label mean cosine ≈ across-label), so propagated labels are
  * NOT expected to match it — the registered row pins engine↔oracle
  * exactness; semantic behaviour is pinned on a clustered fixture in
  * LabelPropagationSpec.
  */
object LabelPropagation {

  val Rounds = 3

  /** @param edges undirected (a, b) — symmetrized internally.
    * @param seeds (vec_id, lbl nullable, is_seed) — full node universe.
    * @return (vec_id, label_prop nullable, is_seed) after [[Rounds]].
    */
  def run(edges: DataFrame, seeds: DataFrame): DataFrame = {
    val und = edges.select(col("a"), col("b"))
    val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var labels = seeds.select(col("vec_id"), col("lbl"))
    val wm = Window.partitionBy("a").orderBy(desc("c"), asc("lbl"))
    for (_ <- 1 to Rounds) {
      val mode = sym
        .join(labels.withColumnRenamed("vec_id", "b"), "b")
        .filter(col("lbl").isNotNull)
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(wm))
        .filter(col("rn") === 1)
        .select(col("a").as("vec_id"), col("lbl").as("mode_lbl"))
      labels = seeds
        .join(mode, Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("is_seed"), col("lbl"))
            .otherwise(col("mode_lbl")).as("lbl"))
        .localCheckpoint(false)
    }
    seeds.select(col("vec_id"), col("is_seed"))
      .join(labels, "vec_id")
      .select(col("vec_id"), col("lbl").as("label_prop"), col("is_seed"))
  }

  private def oracleSql: String = {
    val rounds = (1 to Rounds).map { i =>
      s"""m$i AS MATERIALIZED (
         |  SELECT vec_id, lbl FROM (
         |    SELECT s.a AS vec_id, l.lbl, count(*) AS c,
         |      row_number() OVER (PARTITION BY s.a
         |        ORDER BY count(*) DESC, l.lbl ASC) AS rn
         |    FROM sym s JOIN l${i - 1} l ON s.b = l.vec_id
         |    WHERE l.lbl IS NOT NULL
         |    GROUP BY s.a, l.lbl) WHERE rn = 1),
         |l$i AS MATERIALIZED (
         |  SELECT seeds.vec_id,
         |    CASE WHEN seeds.is_seed THEN seeds.lbl ELSE m$i.lbl END AS lbl
         |  FROM seeds LEFT JOIN m$i ON seeds.vec_id = m$i.vec_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH scored AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |    round(list_cosine_similarity(
       |      a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
       |topk AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY cos DESC, dst ASC) AS rn
       |    FROM scored) WHERE rn <= 5),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM topk),
       |sym AS MATERIALIZED (SELECT a, b FROM und
       |                     UNION ALL SELECT b, a FROM und),
       |seeds AS MATERIALIZED (
       |  SELECT vec_id, CASE WHEN vec_id % 5 = 0 THEN label END AS lbl,
       |         vec_id % 5 = 0 AS is_seed
       |  FROM embeddings),
       |l0 AS MATERIALIZED (SELECT vec_id, lbl FROM seeds),
       |$rounds
       |SELECT s.vec_id, l.lbl AS label_prop, s.is_seed
       |FROM seeds s JOIN l$Rounds l ON s.vec_id = l.vec_id""".stripMargin
  }

  private val q = Q(
    "sim_label_propagation",
    (s, d) => {
      // memoized like the other iterative-loop products: propagated
      // labels over a static kNN graph are a build artifact, computed
      // once per distinct corpus and read by consumers thereafter
      val e = Tables(s, d).embeddings
      graft.domain.SharedCache.materialiseWith(s,
        graft.domain.SharedCache.defaultRoot, "labelprop",
        s"labelprop-v1|${graft.domain.SharedCache.planKey(e)}|5|$Rounds") {
        val edges = KnnGraph.knnGraph(e, k = 5).select("src", "dst")
          .withColumnRenamed("src", "a").withColumnRenamed("dst", "b")
        val seeds = e.select(col("vec_id"),
          when(col("vec_id") % 5 === 0, col("label")).as("lbl"),
          (col("vec_id") % 5 === 0).as("is_seed"))
        run(edges, seeds)
      }
    },
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
