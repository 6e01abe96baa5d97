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
    */
  def neighborhoodFunction(edges: DataFrame, nodes: DataFrame,
      rounds: Int = Rounds): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .distinct().localCheckpoint(false)
    var regs = Hll.bucketRho(nodes, Seq("id"), col("id"))
      .groupBy("id", "bucket").agg(max(col("rho")).as("m"))
      .localCheckpoint(false)
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
          .localCheckpoint(false)
      }
      nf
    }
    perRound.reduce(_ unionByName _)
  }

  private val q = Q(
    "d34_hyperball",
    (s, d) => {
      // the supplier co-occurrence graph the d-series shares: suppliers
      // are linked when they appear on the same order
      val li = Tables(s, d).lineitem.select("l_orderkey", "l_suppkey")
      val edges = li.alias("a").join(li.alias("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_suppkey") < col("b.l_suppkey"))
        .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
        .distinct()
      val nodes = li.select(col("l_suppkey").as("id")).distinct()
      neighborhoodFunction(edges, nodes)
    },
    Some(
      s"""WITH RECURSIVE
         |e0 AS (
         |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
         |nodes AS (SELECT DISTINCT l_suppkey AS id FROM lineitem),
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
