package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) — the directed-graph
  * companion to `d11_pagerank`: PageRank scores global reachability
  * mass, HITS separates "points at good pages" (hub) from "is pointed
  * at by good hubs" (authority), which is the right lens on a DIRECTED
  * derivation graph (doc → quotes-doc, ad → reposts-ad) where the two
  * roles genuinely differ. On the per-nation supplier chains the
  * gradient is real: chain tails have zero hub score (no out-edge),
  * heads zero authority.
  *
  * INTEGER-UNIT determinism, same discipline as [[PageRank]]: scores
  * are max-normalised micro-units (top node = 1e6) with floor division
  * at every step — `a_k = Σ_in h_{k-1}` then `a_k·1e6 div max(a_k)`,
  * symmetrically for hubs — so the trajectory is bit-identical on any
  * engine/partitioning and the oracle replays it as chained CTEs. The
  * L2 normalisation of the float formulation is deliberately traded
  * for max-normalisation: same fixpoint direction, exact arithmetic.
  *
  * Scale: each iteration is one join (scores onto edges) + one
  * hash agg + one single-row max broadcast, per side — the same BSP
  * shape as PageRank, lineage-cut per round. Longs hold the sums up to
  * ~1e12 × max-degree edges; beyond that the two aggregates cast to
  * DECIMAL(38,0) without changing a single emitted value.
  */
object Hits {

  val BaseUnits = 1000000L
  val Iterations = 6

  /** @param edges directed (src, dst).
    * @param nodes one-column (id) universe.
    * @return (id, hub_units, auth_units) after [[Iterations]] rounds.
    */
  def run(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val e = edges.localCheckpoint(true)
    var hub = nodes.select(col("id"), lit(BaseUnits).as("h"))
    var auth = nodes.select(col("id"), lit(BaseUnits).as("a"))
    for (_ <- 1 to Iterations) {
      val aRaw = nodes.join(
          e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("id")).agg(sum(col("h")).as("v")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("v"), lit(0L)).as("a"))
      auth = normalise(aRaw, "a").localCheckpoint(false)
      val hRaw = nodes.join(
          e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(col("src").as("id")).agg(sum(col("a")).as("v")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("v"), lit(0L)).as("h"))
      hub = normalise(hRaw, "h").localCheckpoint(false)
    }
    hub.join(auth, "id")
      .select(col("id"), col("h").as("hub_units"), col("a").as("auth_units"))
  }

  /** score·1e6 div max(score); all-zero vectors stay zero. */
  private def normalise(scores: DataFrame, c: String): DataFrame =
    scores.crossJoin(broadcast(scores.agg(max(col(c)).as("mx"))))
      .select(col("id"),
        when(col("mx") > 0, expr(s"$c * $BaseUnits div mx"))
          .otherwise(0L).as(c))

  /** Directed per-nation supplier chains (ascending suppkey), the
    * forward half of the d11 graph — so heads are pure hubs, tails
    * pure authorities, and interior scores decay geometrically.
    */
  private def chainEdges(t: Tables): DataFrame = {
    val w = Window.partitionBy("s_nationkey").orderBy(asc("s_suppkey"))
    val ranked = t.supplier
      .select(col("s_suppkey"), col("s_nationkey"))
      .withColumn("rn", row_number().over(w))
    ranked.alias("x")
      .join(ranked.alias("y"),
        col("x.s_nationkey") === col("y.s_nationkey") &&
          col("x.rn") === col("y.rn") - 1)
      .select(col("x.s_suppkey").as("src"), col("y.s_suppkey").as("dst"))
  }

  private def oracleSql: String = {
    val rounds = (1 to Iterations).map { k =>
      s"""ar$k AS MATERIALIZED (
         |  SELECT n.id, CAST(coalesce(s.v, 0) AS BIGINT) AS a
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(h.h) AS BIGINT) AS v
         |    FROM e JOIN h${k - 1} h ON e.src = h.id GROUP BY 1) s
         |  ON n.id = s.id),
         |am$k AS (SELECT max(a) AS mx FROM ar$k),
         |a$k AS MATERIALIZED (
         |  SELECT r.id, CASE WHEN m.mx > 0
         |    THEN r.a * $BaseUnits // m.mx ELSE 0 END AS a
         |  FROM ar$k r CROSS JOIN am$k m),
         |hr$k AS MATERIALIZED (
         |  SELECT n.id, CAST(coalesce(s.v, 0) AS BIGINT) AS h
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.src AS id, CAST(sum(a.a) AS BIGINT) AS v
         |    FROM e JOIN a$k a ON e.dst = a.id GROUP BY 1) s
         |  ON n.id = s.id),
         |hm$k AS (SELECT max(h) AS mx FROM hr$k),
         |h$k AS MATERIALIZED (
         |  SELECT r.id, CASE WHEN m.mx > 0
         |    THEN r.h * $BaseUnits // m.mx ELSE 0 END AS h
         |  FROM hr$k r CROSS JOIN hm$k m)""".stripMargin
    }.mkString(",\n")
    s"""WITH ranked AS (
       |  SELECT s_suppkey, s_nationkey,
       |    row_number() OVER (PARTITION BY s_nationkey
       |                       ORDER BY s_suppkey) AS rn
       |  FROM supplier),
       |e AS (
       |  SELECT x.s_suppkey AS src, y.s_suppkey AS dst
       |  FROM ranked x JOIN ranked y
       |    ON x.s_nationkey = y.s_nationkey AND x.rn = y.rn - 1),
       |nodes AS (SELECT s_suppkey AS id FROM supplier),
       |h0 AS (SELECT id, CAST($BaseUnits AS BIGINT) AS h FROM nodes),
       |$rounds
       |SELECT h.id AS s_suppkey,
       |  CAST(h.h AS BIGINT) AS hub_units,
       |  CAST(a.a AS BIGINT) AS auth_units
       |FROM h$Iterations h JOIN a$Iterations a ON h.id = a.id""".stripMargin
  }

  private val q = Q(
    "d27_hits",
    (s, d) => {
      val t = Tables(s, d)
      graft.domain.SharedCache.materialiseWith(s,
        graft.domain.SharedCache.defaultRoot, "hits",
        s"hits-v1|${graft.domain.SharedCache.planKey(t.supplier)}" +
          s"|$Iterations")(
        run(chainEdges(t), t.supplier.select(col("s_suppkey").as("id")))
          .withColumnRenamed("id", "s_suppkey"))
    },
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
