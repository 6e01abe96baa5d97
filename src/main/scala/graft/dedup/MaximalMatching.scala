package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximal matching by synchronous min-id proposals — the
  * distributed pairing primitive behind graph coarsening (each matched
  * pair contracts to a super-node), 1-to-1 record reconciliation, and
  * work-pairing; the local-computation formulation of Israeli & Itai's
  * classic distributed matching with deterministic min-id tie-breaks
  * instead of coin flips. Per round every node proposes to its
  * minimum-id live neighbour; an edge whose endpoints propose to each
  * other is matched; matched nodes leave the graph. [[Rounds]] fixed
  * rounds (each round matches ≥ the greedy chain heads, and the spec
  * pins convergence on hand graphs); the result is maximal on the
  * residual-free case and deterministic everywhere.
  *
  * Scale: per round one degree-shaped min-agg over the symmetrized
  * edge list + one self-join of proposals (id-keyed, carries 2×8
  * bytes) + two semi-join removals — the CC/k-core BSP shape with a
  * lineage cut per round. The oracle replays the identical rounds as
  * chained MATERIALIZED CTEs.
  */
object MaximalMatching {

  val Rounds = 4
  /** Path width for the registered fixture (see the query scaladoc). */
  val PathBucket = 64L

  /** @param edges canonical undirected (a, b), a < b, deduplicated.
    * @return (a, b, round) matched pairs.
    */
  def run(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var live = edges.localCheckpoint(true)
    var matched = Seq.empty[(Long, Long, Int)].toDF("a", "b", "round")
    for (r <- 1 to Rounds) {
      val sym = live.select(col("a").as("n"), col("b").as("p"))
        .union(live.select(col("b").as("n"), col("a").as("p")))
      val prop = sym.groupBy("n").agg(min(col("p")).as("p"))
      val m = live
        .join(prop.select(col("n").as("a"), col("p").as("pa")), "a")
        .join(prop.select(col("n").as("b"), col("p").as("pb")), "b")
        .filter(col("pa") === col("b") && col("pb") === col("a"))
        .select(col("a"), col("b"), lit(r).as("round"))
        .localCheckpoint(true)
      matched = matched.union(m)
      val gone = m.select(col("a").as("n")).union(m.select(col("b").as("n")))
      live = live
        .join(gone.withColumnRenamed("n", "a"), Seq("a"), "left_anti")
        .join(gone.withColumnRenamed("n", "b"), Seq("b"), "left_anti")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
    }
    matched
  }

  private def oracleSql: String = {
    val rounds = (1 to Rounds).map { r =>
      s"""prop$r AS MATERIALIZED (
         |  SELECT n, min(p) AS p FROM (
         |    SELECT a AS n, b AS p FROM e${r - 1}
         |    UNION ALL SELECT b, a FROM e${r - 1})
         |  GROUP BY 1),
         |m$r AS MATERIALIZED (
         |  SELECT e.a, e.b, $r AS round
         |  FROM e${r - 1} e
         |  JOIN prop$r pa ON e.a = pa.n
         |  JOIN prop$r pb ON e.b = pb.n
         |  WHERE pa.p = e.b AND pb.p = e.a),
         |gone$r AS (SELECT a AS n FROM m$r UNION ALL SELECT b FROM m$r),
         |e$r AS MATERIALIZED (
         |  SELECT a, b FROM e${r - 1}
         |  WHERE a NOT IN (SELECT n FROM gone$r)
         |    AND b NOT IN (SELECT n FROM gone$r))""".stripMargin
    }.mkString(",\n")
    val unions = (1 to Rounds)
      .map(r => s"SELECT * FROM m$r").mkString("\nUNION ALL ")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT x.s_suppkey AS a, y.s_suppkey AS b
       |  FROM supplier x JOIN supplier y
       |    ON y.s_suppkey = x.s_suppkey + 1
       |   AND x.s_suppkey // $PathBucket = y.s_suppkey // $PathBucket),
       |$rounds
       |SELECT a, b, CAST(round AS INT) AS round FROM (
       |$unions)""".stripMargin
  }

  /** Bucketed consecutive-key supplier paths: PATH texture, which
    * min-id greedy matching is built for — each round pairs every
    * path's current head, so the match count is rounds×|paths| at ANY
    * scale, and the fixture is dense at ANY sf (the per-nation chains
    * go empty at sf0.001's 10 suppliers; the dense co-occurrence graph
    * matched 30 pairs at sf0.01 but ZERO at sf0.1 — both
    * density-dependent demos, the wrong fixture for a scale-graded
    * operator). Pure arithmetic: edge (k, k+1) whenever both keys
    * exist in the same [[PathBucket]]-wide bucket.
    */
  private val q = Q(
    "d29_maximal_matching",
    (s, d) => {
      val ks = Tables(s, d).supplier.select(col("s_suppkey").as("a"))
      val edges = ks
        .join(ks.select((col("a") - 1L).as("a"), col("a").as("b")), "a")
        .filter(expr(s"a div $PathBucket") === expr(s"b div $PathBucket"))
      run(edges)
    },
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
