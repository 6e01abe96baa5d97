package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampled betweenness centrality (Brandes 2001 dependency
  * accumulation, seed-sampled à la Riondato–Kornaropoulos) — WHICH
  * nodes do shortest paths flow through, the broker/bottleneck measure
  * the rest of the centrality family (d11 rank mass, d19 closeness)
  * cannot see: a low-degree bridge node is invisible to both and is
  * exactly what betweenness ranks first.
  *
  * Exact Brandes is all-sources (O(nm)); the standard scale form runs
  * the two phases from a SAMPLED seed set with bounded depth, and both
  * phases here are the engine's BSP shape:
  *
  *   forward  — per level, frontier ⋈ edges, anti join vs visited,
  *              σ(w) = Σ σ(v) over shortest-path predecessors (one
  *              map-side-combined agg);
  *   backward — per level DESCENDING, δ(v) = Σ_w σ(v)·(1e6 + δ(w)) div
  *              σ(w) over the shortest-path DAG — the PageRank
  *              integer-ppm discipline, so the accumulation is
  *              engine- and partitioning-exact (float δ is the classic
  *              nondeterminism in distributed Brandes).
  *
  * 2·maxDepth jobs total, each touching only frontier-adjacent edges;
  * lineage cut per round. The registered query runs on the d19 chain
  * graph where the dependency has a CLOSED FORM (σ ≡ 1, δ(v) =
  * (deepest − dist(v))·1e6), so the oracle states the truth
  * independently of the machinery; the diamond fixture in the spec pins
  * the σ-weighted split that chains cannot exercise.
  */
object Betweenness {

  val MaxDepth = 4
  private val Ppm = 1000000L

  /** (id, betweenness_units): Σ over seeds of the ppm dependency, for
    * every non-seed node within `maxDepth` of some seed.
    */
  def sampled(edges: DataFrame, seeds: DataFrame,
      maxDepth: Int = MaxDepth): DataFrame = {
    val sym = edges.select(col("src").as("eu"), col("dst").as("ev"))
      .union(edges.select(col("dst").as("eu"), col("src").as("ev")))
      .distinct().localCheckpoint(false)

    // forward: (seed, id, dist, sigma)
    var state = seeds.select(col("id").as("seed"), col("id"),
      lit(0).as("dist"), lit(1L).as("sigma"))
    for (h <- 1 to maxDepth) {
      val frontier = state.filter(col("dist") === h - 1)
      val expanded = frontier.join(sym, col("id") === col("eu"))
        .select(col("seed"), col("ev").as("id"), col("sigma"))
      val fresh = expanded
        .join(state.select(col("seed"), col("id")), Seq("seed", "id"),
          "left_anti")
        .groupBy("seed", "id")
        .agg(sum(col("sigma")).as("sigma"))
        .select(col("seed"), col("id"), lit(h).as("dist"), col("sigma"))
      state = state.unionByName(fresh).localCheckpoint(false)
    }
    val st = state.localCheckpoint(true)

    // shortest-path DAG: (seed, v, sigma_v, w, sigma_w) with
    // dist(w) = dist(v) + 1, plus each level's node list
    val dag = st.select(col("seed"), col("id").as("v"),
        col("dist").as("vd"), col("sigma").as("sv"))
      .join(sym, col("v") === col("eu"))
      .join(st.select(col("seed").as("ws"), col("id").as("w"),
        col("dist").as("wd"), col("sigma").as("sw")),
        col("ws") === col("seed") && col("w") === col("ev") &&
          col("wd") === col("vd") + 1)
      .select(col("seed"), col("v"), col("vd"), col("sv"), col("w"),
        col("sw"))
      .localCheckpoint(true)

    // backward: δ in ppm, level by level from the deepest
    var delta = st.filter(col("dist") === maxDepth)
      .select(col("seed"), col("id"), lit(0L).as("delta"))
    for (h <- maxDepth - 1 to 0 by -1) {
      val sums = dag.filter(col("vd") === h)
        .join(delta.select(col("seed").as("ds"), col("id").as("dwid"),
          col("delta").as("dw")),
          col("ds") === col("seed") && col("dwid") === col("w"))
        .select(col("seed"), col("v"),
          expr(s"sv * ($Ppm + dw) div sw").as("term"))
        .groupBy(col("seed"), col("v").as("id"))
        .agg(sum(col("term")).as("dsum"))
      val levelDelta = st.filter(col("dist") === h)
        .select(col("seed"), col("id"))
        .join(sums, Seq("seed", "id"), "left")
        .select(col("seed"), col("id"),
          coalesce(col("dsum"), lit(0L)).as("delta"))
      delta = delta.unionByName(levelDelta).localCheckpoint(false)
    }

    st.filter(col("dist") > 0).select(col("seed"), col("id"))
      .join(delta, Seq("seed", "id"))
      .groupBy("id")
      .agg(sum(col("delta")).as("betweenness_units"))
  }

  private val q = Q(
    "d25_betweenness_sampled",
    (s, d) => {
      val t = Tables(s, d)
      val grp = pmod(col("s_nationkey"), lit(4)).as("grp")
      val w = Window.partitionBy("grp").orderBy(asc("s_suppkey"))
      val ranked = t.supplier
        .select(col("s_suppkey"), grp)
        .withColumn("rn", row_number().over(w))
      val edges = ranked.alias("a")
        .join(ranked.alias("b"),
          col("a.grp") === col("b.grp") &&
            col("a.rn") === col("b.rn") - 1)
        .select(col("a.s_suppkey").as("src"), col("b.s_suppkey").as("dst"))
      val seeds = ranked.filter(col("rn") === 1)
        .select(col("s_suppkey").as("id"))
      sampled(edges, seeds).withColumnRenamed("id", "s_suppkey")
    },
    // chain closed form: σ ≡ 1 and the truncated dependency of the node
    // at rank r (seed = rank 1, depth cap D, chain length n) is
    // (min(D, n−1) − (r−1)) · 1e6 for 1 ≤ r−1 ≤ min(D, n−1)
    Some(
      s"""WITH ranked AS (
         |  SELECT s_suppkey,
         |    row_number() OVER (PARTITION BY ((s_nationkey % 4) + 4) % 4
         |      ORDER BY s_suppkey) AS rn,
         |    ((s_nationkey % 4) + 4) % 4 AS grp
         |  FROM supplier),
         |glen AS (SELECT grp, count(*) AS n FROM ranked GROUP BY 1)
         |SELECT r.s_suppkey,
         |  CAST((least($MaxDepth, g.n - 1) - (r.rn - 1)) * $Ppm
         |    AS BIGINT) AS betweenness_units
         |FROM ranked r JOIN glen g USING (grp)
         |WHERE r.rn - 1 BETWEEN 1 AND least($MaxDepth, g.n - 1)"""
        .stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
