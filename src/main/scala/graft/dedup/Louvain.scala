package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One synchronous Louvain local-moving sweep (Blondel et al. 2008) over
  * the WEIGHTED supplier co-occurrence graph — the modularity-ascending
  * community step beside the engine's other detectors (label propagation,
  * spectral bipartition) and its partition auditor (`d14_modularity`).
  *
  * From the singleton start every Louvain run begins with, node i's gain
  * for joining neighbour j's community reduces to
  *
  *   ΔQ(i→j) ∝ 2m_w·w_ij − k_i·k_j        (exact BIGINT numerator)
  *
  * (m_w = total edge weight, k = node strength; the removal term vanishes
  * for singletons, and the common 1/(2m_w²) denominator never needs to be
  * materialised). Each node takes its best positive-gain move
  * simultaneously — max gain, ties to the smallest neighbour id, so the
  * sweep is deterministic under any partitioning and replays exactly in
  * SQL. A cluster run iterates sweeps + community-graph contraction with
  * this same per-round plan; one audited round is the representative unit
  * (the same framing as the engine's k-means/PageRank/BFS loops).
  *
  * Scale shape: the corpus-sized work is the weighted-edge build (one
  * self-join + hash agg, shared via the plan-keyed cache); the sweep
  * itself is one strength agg, one 1-row total broadcast, an edge⋈strength
  * join, and a per-node argmax window bounded by degree — the CC/PageRank
  * BSP family. Nothing pairwise beyond the edge list itself.
  *
  * Reference anchor: community structure over the skills co-occurrence
  * graph is exactly what `flows/enrich/labs/skills/cluster_utils.py`
  * chases with ensemble KMeans; Louvain is the graph-native form.
  */
object Louvain {

  /** Weighted canonical co-occurrence edges (a < b, w = shared orders),
    * memoized once per distinct input beside `cooc_und`.
    */
  private def weightedEdges(t: Tables): DataFrame = {
    val li = t.lineitem.select("l_orderkey", "l_suppkey")
    graft.domain.SharedCache.materialiseWith(li.sparkSession,
      graft.domain.SharedCache.defaultRoot, "cooc_w",
      s"cooc-w-v1|${graft.domain.SharedCache.planKey(li)}")(
      li.alias("x").join(li.alias("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .groupBy(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
        .agg(count(lit(1)).as("w")))
  }

  /** @param und weighted canonical undirected edges (a, b, w), a < b.
    * @return per node: (n, community, gain_num) — the post-sweep label
    *   and the exact gain numerator (0 when the node stays put).
    */
  def run(und: DataFrame): DataFrame = {
    val sym = und.select(col("a"), col("b"), col("w"))
      .union(und.select(col("b").as("a"), col("a").as("b"), col("w")))
    val strength = sym.groupBy("a").agg(sum(col("w")).as("k"))
      .select(col("a").as("n"), col("k"))
    val m2 = sym.agg(sum(col("w")).as("m2")) // = 2·m_w
    val cand = sym
      .join(strength.select(col("n").as("a"), col("k").as("ka")), "a")
      .join(strength.select(col("n").as("b"), col("k").as("kb")), "b")
      .crossJoin(broadcast(m2))
      .select(col("a").as("n"), col("b").as("j"),
        (col("m2") * col("w") - col("ka") * col("kb")).as("gain"))
    val w = Window.partitionBy("n").orderBy(desc("gain"), asc("j"))
    val best = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    strength.select(col("n"))
      .join(best, Seq("n"), "left")
      .select(col("n"),
        when(col("gain") > 0, col("j")).otherwise(col("n"))
          .as("community"),
        when(col("gain") > 0, col("gain")).otherwise(lit(0L))
          .as("gain_num"))
  }

  private val q = Q(
    "d21_louvain_move",
    (s, d) => run(weightedEdges(Tables(s, d)))
      .withColumnRenamed("n", "s_suppkey"),
    Some(
      """WITH cooc AS (
        |  SELECT x.l_suppkey AS a, y.l_suppkey AS b, count(*) AS w
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
        |  GROUP BY 1, 2),
        |sym AS (SELECT a, b, w FROM cooc
        |        UNION ALL SELECT b, a, w FROM cooc),
        |strength AS (SELECT a AS n, sum(w) AS k FROM sym GROUP BY 1),
        |m2 AS (SELECT sum(w) AS m2 FROM sym),
        |cand AS (
        |  SELECT s.a AS n, s.b AS j,
        |    (SELECT m2 FROM m2) * s.w - ka.k * kb.k AS gain
        |  FROM sym s
        |  JOIN strength ka ON s.a = ka.n
        |  JOIN strength kb ON s.b = kb.n),
        |best AS (
        |  SELECT n, j, gain,
        |    row_number() OVER (PARTITION BY n
        |                       ORDER BY gain DESC, j ASC) AS rn
        |  FROM cand)
        |SELECT st.n AS s_suppkey,
        |  CAST(CASE WHEN b.gain > 0 THEN b.j ELSE st.n END
        |    AS BIGINT) AS community,
        |  CAST(CASE WHEN b.gain > 0 THEN b.gain ELSE 0 END
        |    AS BIGINT) AS gain_num
        |FROM strength st
        |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON st.n = b.n"""
        .stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
