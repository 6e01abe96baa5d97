package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss peeling (Cohen 2008) — the EDGE-cohesion decomposition
  * beside `d13_kcore`'s node degrees: an edge survives the k-truss iff
  * it closes ≥ k−2 triangles among surviving edges, iterated to a
  * fixpoint. Trusses are the standard "strong tie" extractor — an
  * edge in many triangles is socially embedded, a bridge is not — and
  * the peel ORDER is the output here: (a, b, removed_round), with
  * NULL for edges still standing after [[Rounds]] rounds.
  *
  * Each round = one degree-oriented triangle enumeration (the d12
  * wedge join, Σ outdeg² ≤ O(m^1.5)) + an edge-keyed support agg + a
  * filter — BSP with a lineage cut per round; the oracle replays the
  * identical rounds. Fixture: the bucketed +1/+2/+3 lattice (dense at
  * any sf, triangle-rich, interior supports ≥ 2 so the 4-truss is
  * nonempty).
  */
object KTruss {

  val K = 4
  val Rounds = 3
  val PathBucket = 64L

  /** @param edges canonical (a < b), deduplicated.
    * @return (a, b, removed_round); NULL round = still in the truss.
    */
  def run(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var live = edges.localCheckpoint(true)
    var removed = Seq.empty[(Long, Long, Int)].toDF("a", "b", "removed_round")
    for (r <- 1 to Rounds) {
      // support per live edge: triangles via the canonical wedge join
      val w1 = live.select(col("a").as("u"), col("b").as("v1"))
      val w2 = live.select(col("a").as("u"), col("b").as("v2"))
      val tri = w1.join(w2, "u").filter(col("v1") < col("v2"))
        .join(live.select(col("a").as("v1"), col("b").as("v2")),
          Seq("v1", "v2"))
      // each triangle (u, v1, v2) supports its three edges
      val support = tri.select(col("u").as("a"), col("v1").as("b"))
        .union(tri.select(col("u").as("a"), col("v2").as("b")))
        .union(tri.select(col("v1").as("a"), col("v2").as("b")))
        .groupBy("a", "b").agg(count(lit(1)).as("sup"))
      val weak = live.join(support, Seq("a", "b"), "left")
        .filter(coalesce(col("sup"), lit(0L)) < K - 2)
        .select(col("a"), col("b"), lit(r).as("removed_round"))
        .localCheckpoint(true)
      removed = removed.union(weak)
      live = live.join(weak.select("a", "b"), Seq("a", "b"), "left_anti")
        .localCheckpoint(true)
    }
    removed.union(live.select(col("a"), col("b"),
      lit(null).cast("int").as("removed_round")))
  }

  private def oracleSql: String = {
    val rounds = (1 to Rounds).map { r =>
      s"""tri$r AS MATERIALIZED (
         |  SELECT w1.u, w1.v1, w2.v2
         |  FROM (SELECT a AS u, b AS v1 FROM e${r - 1}) w1
         |  JOIN (SELECT a AS u, b AS v2 FROM e${r - 1}) w2
         |    ON w1.u = w2.u AND w1.v1 < w2.v2
         |  JOIN e${r - 1} c ON c.a = w1.v1 AND c.b = w2.v2),
         |sup$r AS (
         |  SELECT a, b, count(*) AS sup FROM (
         |    SELECT u AS a, v1 AS b FROM tri$r
         |    UNION ALL SELECT u, v2 FROM tri$r
         |    UNION ALL SELECT v1, v2 FROM tri$r)
         |  GROUP BY 1, 2),
         |weak$r AS MATERIALIZED (
         |  SELECT e.a, e.b, $r AS removed_round
         |  FROM e${r - 1} e LEFT JOIN sup$r s
         |    ON e.a = s.a AND e.b = s.b
         |  WHERE coalesce(s.sup, 0) < ${K - 2}),
         |e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${r - 1} e
         |  WHERE NOT EXISTS (SELECT 1 FROM weak$r w
         |    WHERE w.a = e.a AND w.b = e.b))""".stripMargin
    }.mkString(",\n")
    val removedUnion = (1 to Rounds)
      .map(r => s"SELECT a, b, removed_round FROM weak$r")
      .mkString("\nUNION ALL ")
    s"""WITH ks AS (SELECT s_suppkey AS id FROM supplier),
       |e0 AS MATERIALIZED (
       |  SELECT x.id AS a, y.id AS b
       |  FROM ks x JOIN ks y
       |    ON y.id IN (x.id + 1, x.id + 2, x.id + 3)
       |   AND x.id // $PathBucket = y.id // $PathBucket),
       |$rounds
       |SELECT a, b, CAST(removed_round AS INT) AS removed_round FROM (
       |$removedUnion
       |UNION ALL SELECT a, b, NULL FROM e$Rounds)""".stripMargin
  }

  private val q = Q(
    "d31_ktruss_peel",
    (s, d) => {
      val ks = Tables(s, d).supplier.select(col("s_suppkey").as("id"))
      val a = ks.select(col("id").as("a"))
      val edges = (1 to 3).map { step =>
        a.join(ks.select((col("id") - step.toLong).as("a"),
          col("id").as("b")), "a")
      }.reduce(_ union _)
        .filter(expr(s"a div $PathBucket") === expr(s"b div $PathBucket"))
      run(edges)
    },
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
