package graft.dedup

import graft.{Q, Tables}
import graft.operators.Hll
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperBall (Boldi & Vigna 2013) — the approximate neighborhood
  * function: per node v and radius r, an HLL counter of ball(v, r),
  * advanced by one BSP round per radius
  *
  *   B(v, r) = B(v, r−1) ∪ ⋃_{(v,u)∈E} B(u, r−1)
  *
  * which in register space is a max-merge — each round is ONE
  * edges ⋈ registers equi join + a (node, bucket)-keyed MAX aggregate,
  * with a lineage cut per round. This is the canonical trillion-edge
  * diameter/centrality algorithm precisely because the per-node state
  * is m registers instead of a reachable SET: the round cost is
  * |E|·m-bounded and partition-agnostic. `d16_khop_distances`' scaladoc
  * names this as the frontier loop's sketch upgrade; this row is that
  * upgrade, realised.
  *
  * Output: the neighborhood function N(r) = Σ_v |̂B(v, r)| for
  * r = 0..[[Rounds]] (the curve whose saturation radius is the
  * effective-diameter read-out), plus the exact N(r) from true
  * reachability — the oracle computes BOTH: registers of a ball are a
  * deterministic function of the ball's members (max over member
  * hashes), so DuckDB rebuilds them from exact recursive reachability
  * without replaying rounds — merge-over-rounds ≡ registers-of-the-set,
  * the same mergeability proof a26 makes for shard merges, here for BSP
  * round merges.
  */
object HyperBall {

  val Rounds = 3

  /** (r, nf_approx) for r = 0..rounds over an undirected edge list and
    * node set; nf_approx uses the linear-counting-corrected estimator
    * shared with `w13_windowed_hll`.
    *
    * Registers are sparse (node, bucket, rho) ROWS merged by a keyed
    * MAX: the per-round join fans out |E| × occupied-buckets rows, all
    * absorbed map-side by the partial aggregation. That bounds round
    * cost by |E|·|ball| — which is the honest cost model: HyperBall is
    * a SPARSE-graph algorithm (its register unions track ball growth,
    * and on a near-complete graph every counter holds every node, so
    * ANY layout degenerates — measured here: the 90%-complete supplier
    * co-occurrence graph fanned rounds to 386M rows; a dense-array
    * Aggregator layout was tried and was WORSE, 4× slower again, boxed
    * element merges costing more than the row fan-out they saved).
    * EAGER checkpoints cut each round's lineage; a lazy cut would let
    * the output's 4 union branches recompute the shared edge build
    * inside the one job that evaluates them.
    */
  def neighborhoodFunction(edges: DataFrame, nodes: DataFrame,
      rounds: Int = Rounds): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .distinct().localCheckpoint(true)
    var regs = Hll.bucketRho(nodes, Seq("id"), col("id"))
      .groupBy("id", "bucket").agg(max(col("rho")).as("m"))
      .localCheckpoint(true)
    val perRound = (0 to rounds).map { r =>
      val nf = Hll.estimateCorrected(regs, Seq("id"))
        .agg(graft.util.Stable.dsum(col("approx"), 4).as("nf_approx"))
        .select(lit(r).as("r"), col("nf_approx"))
      if (r < rounds) {
        val merged = sym
          .join(regs, col("v") === col("id"))
          .select(col("u").as("id"), col("bucket"), col("m"))
        regs = regs.union(merged)
          .groupBy("id", "bucket").agg(max(col("m")).as("m"))
          .localCheckpoint(true)
      }
      nf
    }
    perRound.reduce(_ unionByName _)
  }

  private val q = Q(
    "d34_hyperball",
    (s, d) => {
      // the d3/d16 supplier-chain graph (rank i ↔ i+1 within a nation):
      // a SPARSE graph, which is HyperBall's regime — the supplier
      // co-occurrence graph was measured 90% complete at sf0.1, where
      // every ball is the whole component by r=1 and the neighborhood
      // function is a constant (a recall ceiling, not a workload)
      val sup = Tables(s, d).supplier
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("s_nationkey").orderBy("s_suppkey")
      val ranked = sup.select(col("s_suppkey"), col("s_nationkey"))
        .withColumn("rk", row_number().over(w))
      val edges = ranked.alias("a").join(ranked.alias("b"),
          col("a.s_nationkey") === col("b.s_nationkey") &&
            col("a.rk") + 1 === col("b.rk"))
        .select(col("a.s_suppkey").as("src"), col("b.s_suppkey").as("dst"))
      val nodes = sup.select(col("s_suppkey").as("id"))
      neighborhoodFunction(edges, nodes)
    },
    Some(
      s"""WITH RECURSIVE
         |rk AS (
         |  SELECT s_suppkey, s_nationkey,
         |    row_number() OVER (PARTITION BY s_nationkey
         |                       ORDER BY s_suppkey) AS rk
         |  FROM supplier),
         |e1 AS (
         |  SELECT a.s_suppkey AS u, b.s_suppkey AS v
         |  FROM rk a JOIN rk b
         |    ON a.s_nationkey = b.s_nationkey AND a.rk + 1 = b.rk),
         |e0 AS (
         |  SELECT u, v FROM e1 UNION ALL SELECT v, u FROM e1),
         |nodes AS (SELECT s_suppkey AS id FROM supplier),
         |reach(id, mem, r) AS (
         |  SELECT id, id, 0 FROM nodes
         |  UNION
         |  SELECT reach.id, e0.v, reach.r + 1
         |  FROM reach JOIN e0 ON reach.mem = e0.u WHERE reach.r < $Rounds),
         |ball AS (SELECT id, mem, min(r) AS d FROM reach GROUP BY 1, 2),
         |items AS (SELECT DISTINCT mem AS doc_id, 0 AS i,
         |            CAST(mem AS VARCHAR) AS t FROM ball),
         |${graft.functions.OracleSql.fnvFold("items")},
         |${graft.functions.OracleSql.fmix64},
         |hw AS (
         |  SELECT b.id, b.d, m.u % 512 AS bucket, m.u // 512 AS w
         |  FROM ball b JOIN mixed m ON b.mem = m.doc_id),
         |radii AS (SELECT unnest(range($Rounds + 1)) AS rr),
         |regs AS (
         |  SELECT radii.rr, hw.id, hw.bucket, max(${Hll.RhoCase}) AS m
         |  FROM radii JOIN hw ON hw.d <= radii.rr
         |  GROUP BY 1, 2, 3),
         |agg AS (
         |  SELECT rr, id, count(*) AS seen,
         |    sum(CAST(1::BIGINT << (56 - m) AS HUGEINT)) AS s_seen
         |  FROM regs GROUP BY 1, 2),
         |est AS (
         |  SELECT rr, id, seen,
         |    CAST(CAST('${Hll.AlphaNumer}' AS HUGEINT) // (s_seen +
         |      (512 - seen) * CAST('72057594037927936' AS HUGEINT))
         |      AS DOUBLE) / 10000.0 AS raw
         |  FROM agg),
         |corrected AS (
         |  SELECT rr, id,
         |    CASE WHEN raw <= 1280.0 AND (512 - seen) > 0
         |         THEN round(512 * ln(512.0 / (512 - seen)), 4)
         |         ELSE raw END AS approx
         |  FROM est)
         |SELECT CAST(rr AS INT) AS r,
         |  ${graft.util.Stable.dsumSql("approx")} AS nf_approx
         |FROM corrected GROUP BY rr""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
