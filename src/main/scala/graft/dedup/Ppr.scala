package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Personalized PageRank — d11's recurrence with the teleport vector
  * concentrated on a SEED SET instead of uniform: the random surfer
  * restarts only at seeds, so rank measures proximity-with-decay to the
  * seeds. The workhorse of seed-expansion: "given these known-good
  * suppliers / known-spam docs / labelled entities, rank everything by
  * association" (recommendation, trust propagation, local community
  * seeds — Andersen-Chung-Lang's PPR-sweep uses exactly this vector).
  *
  * Same integer-unit discipline as d11 (`PageRank`): ranks in 1e6 units,
  * per-edge contribution `rank div outdeg`, damped update
  * `teleport_i + (85·Σin) div 100` with teleport_i = 150000 for seeds and
  * 0 otherwise — floor division everywhere, so the trajectory is
  * bit-identical on any engine/partitioning and the oracle replays the
  * rounds as chained CTEs. Non-seed mass decays geometrically with hop
  * distance from the seed set; isolated non-seeds converge to 0.
  *
  * Scale shape: identical to d11 — per round one join (ranks onto
  * out-edges) + one agg (incoming mass), lineage cut per round; the edge
  * set here is the shared weighted co-occurrence graph so the build is
  * amortised across the graph family. Registered with nation-0 suppliers
  * as seeds.
  */
object Ppr {

  val Iterations = 6
  val SeedUnits = 150000L

  /** @param edges directed (src, dst) — symmetrize upstream if needed.
    * @param nodes (id, tp) universe with per-node teleport units.
    * @return (id, rank_units) after [[Iterations]] rounds from r0 = tp.
    */
  def run(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = edges.join(deg, "src").localCheckpoint(true)
    var ranks = nodes.select(col("id"), col("tp").as("rank"))
    for (_ <- 1 to Iterations) {
      val in = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("m"))
      ranks = nodes
        .join(in.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (col("tp") + expr("85 * coalesce(m, 0L) div 100")).as("rank"))
        .localCheckpoint(false) // per-round barrier, same rationale as d11
    }
    ranks.select(col("id"), col("rank").as("rank_units"))
  }

  private val q = Q(
    "d22_personalized_pagerank",
    (s, d) => {
      val t = Tables(s, d)
      graft.domain.SharedCache.materialiseWith(s,
        graft.domain.SharedCache.defaultRoot, "ppr",
        // v2: seed rule = min PRESENT nation key (cache key must move
        // with the seed definition, or a stale artifact answers)
        s"ppr-v2|${graft.domain.SharedCache.planKey(t.lineitem)}" +
          s"|$Iterations")(
      {
        val und = CoocGraph.undirected(t)
        val edges = und.select(col("src"), col("dst"))
          .union(und.select(col("dst").as("src"), col("src").as("dst")))
        // seeds = suppliers of the smallest nation key PRESENT (a fixed
        // "nation 0" is empty at tiny SFs, degenerating every rank to 0)
        val minNation = t.supplier.agg(min(col("s_nationkey")).as("mn"))
        val nodes = t.supplier.crossJoin(broadcast(minNation))
          .select(col("s_suppkey").as("id"),
            when(col("s_nationkey") === col("mn"), lit(SeedUnits))
              .otherwise(lit(0L)).as("tp"))
        run(edges, nodes).withColumnRenamed("id", "s_suppkey")
      })
    },
    Some {
      val rounds = (1 to Iterations).map { k =>
        s"""r$k AS (
           |  SELECT n.id, n.tp + (85 * coalesce(s.m, 0)) // 100 AS rank
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS id, sum(r.rank // e.outdeg) AS m
           |    FROM e JOIN r${k - 1} r ON e.src = r.id
           |    GROUP BY e.dst) s ON n.id = s.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH und AS (
         |  SELECT DISTINCT x.l_suppkey AS src, y.l_suppkey AS dst
         |  FROM lineitem x JOIN lineitem y
         |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey),
         |edges AS (SELECT src, dst FROM und
         |          UNION ALL SELECT dst, src FROM und),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |e AS (SELECT edges.src, edges.dst, deg.outdeg
         |      FROM edges JOIN deg ON edges.src = deg.src),
         |nodes AS (
         |  SELECT s_suppkey AS id,
         |    CAST(CASE WHEN s_nationkey =
         |        (SELECT min(s_nationkey) FROM supplier)
         |      THEN $SeedUnits ELSE 0 END AS BIGINT) AS tp
         |  FROM supplier),
         |r0 AS (SELECT id, tp AS rank FROM nodes),
         |$rounds
         |SELECT id AS s_suppkey, CAST(rank AS BIGINT) AS rank_units
         |FROM r$Iterations""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
