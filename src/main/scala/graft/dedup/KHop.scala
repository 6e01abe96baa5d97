package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded multi-source BFS: distance (in hops, ≤ maxHops) from a seed
  * set over an undirected edge list — the "k-hop neighborhood" query
  * behind contamination-spread analysis (how far does a bad document's
  * influence reach through the duplicate graph?) and GNN-style
  * neighborhood sampling.
  *
  * BSP shape like the CC/label-propagation family: each round is one
  * edge ⋈ frontier equi join + a min hash agg, cost ∝ edges touching
  * the current frontier; lineage cut per round. Bounded depth keeps
  * both the job count and the SQL replay finite — unbounded
  * shortest-path belongs to the CC loop's converge-detect machinery,
  * bounded-radius queries (the common production ask) belong here.
  */
object KHop {

  val MaxHops = 3

  /** (id, dist) for every node within `maxHops` of `seeds`; seeds are
    * dist 0. Ties resolve to the minimum distance by construction.
    */
  def distances(edges: DataFrame, seeds: DataFrame,
      maxHops: Int = MaxHops): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .distinct().localCheckpoint(false)
    var dist = seeds.select(col("id"), lit(0).as("dist"))
    for (h <- 1 to maxHops) {
      val frontier = dist.filter(col("dist") === h - 1)
      val expanded = frontier
        .join(sym, frontier("id") === sym("u"))
        .select(col("v").as("id"), lit(h).as("dist"))
      dist = dist.union(expanded)
        .groupBy("id").agg(min(col("dist")).as("dist"))
        .localCheckpoint(false)
    }
    dist
  }

  private val q = Q(
    "d16_khop_distances",
    (s, d) => {
      // the d3 supplier chains (rank i ↔ rank i+1 within a nation),
      // seeded at each nation's first supplier: true distance of rank r
      // is r−1, so the oracle states the truth from the rank window
      // alone — fully independent of the BFS machinery
      val t = Tables(s, d)
      val w = Window.partitionBy("s_nationkey").orderBy(asc("s_suppkey"))
      val ranked = t.supplier
        .select(col("s_suppkey"), col("s_nationkey"))
        .withColumn("rn", row_number().over(w))
      val edges = ranked.alias("a")
        .join(ranked.alias("b"),
          col("a.s_nationkey") === col("b.s_nationkey") &&
            col("a.rn") === col("b.rn") - 1)
        .select(col("a.s_suppkey").as("src"), col("b.s_suppkey").as("dst"))
      val seeds = ranked.filter(col("rn") === 1)
        .select(col("s_suppkey").as("id"))
      distances(edges, seeds).withColumnRenamed("id", "s_suppkey")
    },
    Some(
      s"""SELECT s_suppkey, CAST(rn - 1 AS INT) AS dist FROM (
         |  SELECT s_suppkey,
         |    row_number() OVER (PARTITION BY s_nationkey
         |      ORDER BY s_suppkey) AS rn
         |  FROM supplier)
         |WHERE rn - 1 <= $MaxHops""".stripMargin),
  )

  /** Bounded-radius distances from EVERY node at once — the same BSP
    * loop with (root, id) state, the landmark-free form of
    * HyperBall-style centrality estimation. Frontier volume per round
    * is Σ_v |h-hop ball(v)| — bounded radius is what keeps it linear-ish
    * on sparse graphs; on dense graphs swap the exact (root, id) state
    * for per-node HLL registers (the HyperBall trick, same loop).
    */
  def multiSourceDistances(edges: DataFrame, maxHops: Int = MaxHops)
      : DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .distinct().localCheckpoint(false)
    var dist = sym.select(col("u")).distinct()
      .select(col("u").as("root"), col("u").as("id"), lit(0).as("dist"))
    for (h <- 1 to maxHops) {
      val frontier = dist.filter(col("dist") === h - 1)
      val expanded = frontier
        .join(sym, frontier("id") === sym("u"))
        .select(col("root"), col("v").as("id"), lit(h).as("dist"))
      dist = dist.union(expanded)
        .groupBy("root", "id").agg(min(col("dist")).as("dist"))
        .localCheckpoint(false)
    }
    dist
  }

  /** Harmonic centrality within radius [[MaxHops]]: Σ 1/d over reached
    * nodes, in integer micro-units (1e6 div d — floor division, the
    * PageRank discipline, so the score is engine- and order-exact).
    */
  def harmonic(edges: DataFrame, maxHops: Int = MaxHops): DataFrame =
    multiSourceDistances(edges, maxHops)
      .filter(col("dist") > 0)
      .groupBy("root")
      .agg(sum(expr("1000000 div dist")).as("harmonic_units"))

  // On the chain graph the true distance is the rank gap, so the oracle
  // states harmonic centrality in closed form from the rank window
  // alone — fully independent of the BFS machinery. Chains group on
  // s_nationkey mod 4 (plain nationkey leaves every sf0.001 nation a
  // singleton — no edges, no graph).
  private val hq = Q(
    "d19_harmonic_centrality",
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
      harmonic(edges).withColumnRenamed("root", "s_suppkey")
    },
    Some(
      s"""WITH ranked AS (
         |  SELECT s_suppkey,
         |    row_number() OVER (PARTITION BY ((s_nationkey % 4) + 4) % 4
         |      ORDER BY s_suppkey) AS rn,
         |    ((s_nationkey % 4) + 4) % 4 AS grp
         |  FROM supplier),
         |pairs AS (
         |  SELECT a.s_suppkey, abs(a.rn - b.rn) AS d
         |  FROM ranked a JOIN ranked b
         |    ON a.grp = b.grp AND a.s_suppkey <> b.s_suppkey
         |  WHERE abs(a.rn - b.rn) <= $MaxHops)
         |SELECT s_suppkey,
         |  CAST(sum(1000000 // d) AS BIGINT) AS harmonic_units
         |FROM pairs GROUP BY 1""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q, hq)
}
