package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-1 alternating least squares on a bipartite rating graph — the
  * smallest real matrix-factorisation loop (the ALS inner step behind
  * collaborative filtering), in the engine's integer-unit BSP
  * discipline: user and item factors live in max-normalised milli
  * units (top factor = 1000) and each half-step is the exact rank-1
  * least-squares solve u_i = Σ r·v / Σ v², evaluated in floor integer
  * arithmetic — so the trajectory replays bit-for-bit as chained CTEs
  * on any engine, like [[graft.dedup.PageRank]] and
  * [[graft.dedup.Hits]].
  *
  * Scale: each half-step is one join (factors onto the rating edges) +
  * one keyed agg + a 1-row max broadcast — BSP with a lineage cut per
  * half-step. The cut is MEASURED, not stylistic: composing all six
  * half-steps into one lazy plan re-evaluates the upstream under every
  * one-row max subquery (3.3 s → 12.2 s cold, 3.9 s warm at sf0.1) —
  * the same repeated-subtree trap PageRank documented for its rank
  * chain. Ratings = lineitem quantities on the (supplier, part)
  * bipartite graph.
  */
object Rank1Als {

  val BaseUnits = 1000L
  val Alternations = 3

  /** @param ratings (u, i, r) — r small nonneg integers.
    * @return (id, side ["u"|"i"], factor_units).
    */
  def run(ratings: DataFrame): DataFrame = {
    val spark = ratings.sparkSession
    val e = ratings.localCheckpoint(true)
    val items0 = e.select(col("i")).distinct()
      .select(col("i"), lit(BaseUnits).as("v"))
    var items = items0
    var users: DataFrame = null
    for (_ <- 1 to Alternations) {
      val uRaw = e.join(items, "i")
        .groupBy("u")
        .agg(sum(col("r") * col("v")).as("num"),
          sum(col("v") * col("v")).as("den"))
        .select(col("u"),
          expr(s"($BaseUnits * num) div den").as("f"))
      users = normalise(uRaw, "u", "f").localCheckpoint(false)
      val iRaw = e.join(users.withColumnRenamed("f", "fu"), "u")
        .groupBy("i")
        .agg(sum(col("r") * col("fu")).as("num"),
          sum(col("fu") * col("fu")).as("den"))
        .select(col("i"),
          expr(s"($BaseUnits * num) div den").as("v"))
      items = normalise(iRaw, "i", "v").localCheckpoint(false)
    }
    users.select(col("u").as("id"), lit("u").as("side"),
        col("f").as("factor_units"))
      .union(items.select(col("i").as("id"), lit("i").as("side"),
        col("v").as("factor_units")))
  }

  /** Max-normalise to [1, 1000] units — the floor at 1 keeps every
    * Σv² denominator nonzero (ANSI integer div-by-zero would abort a
    * user whose whole neighbourhood rounded to 0).
    */
  private def normalise(df: DataFrame, key: String, c: String): DataFrame =
    df.crossJoin(broadcast(df.agg(max(col(c)).as("mx"))))
      .select(col(key),
        greatest(when(col("mx") > 0, expr(s"$c * $BaseUnits div mx"))
          .otherwise(0L), lit(1L)).as(c))

  private def oracleSql: String = {
    val steps = (1 to Alternations).map { k =>
      s"""ur$k AS MATERIALIZED (
         |  SELECT e.u,
         |    $BaseUnits * CAST(sum(e.r * v.v) AS BIGINT)
         |      // CAST(sum(v.v * v.v) AS BIGINT) AS f
         |  FROM e JOIN i${k - 1} v ON e.i = v.i GROUP BY 1),
         |um$k AS (SELECT max(f) AS mx FROM ur$k),
         |u$k AS MATERIALIZED (
         |  SELECT r.u, greatest(CASE WHEN m.mx > 0
         |    THEN r.f * $BaseUnits // m.mx ELSE 0 END, 1) AS f
         |  FROM ur$k r CROSS JOIN um$k m),
         |ir$k AS MATERIALIZED (
         |  SELECT e.i,
         |    $BaseUnits * CAST(sum(e.r * u.f) AS BIGINT)
         |      // CAST(sum(u.f * u.f) AS BIGINT) AS v
         |  FROM e JOIN u$k u ON e.u = u.u GROUP BY 1),
         |im$k AS (SELECT max(v) AS mx FROM ir$k),
         |i$k AS MATERIALIZED (
         |  SELECT r.i, greatest(CASE WHEN m.mx > 0
         |    THEN r.v * $BaseUnits // m.mx ELSE 0 END, 1) AS v
         |  FROM ir$k r CROSS JOIN im$k m)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT l_suppkey AS u, l_partkey AS i,
       |    CAST(sum(l_quantity) AS BIGINT) AS r
       |  FROM lineitem GROUP BY 1, 2),
       |i0 AS (SELECT DISTINCT i, CAST($BaseUnits AS BIGINT) AS v FROM e),
       |$steps
       |SELECT u AS id, 'u' AS side, CAST(f AS BIGINT) AS factor_units
       |FROM u$Alternations
       |UNION ALL
       |SELECT i, 'i', CAST(v AS BIGINT) FROM i$Alternations""".stripMargin
  }

  private val q = Q(
    "sim_rank1_als",
    (s, d) => {
      val li = Tables(s, d).lineitem
      run(li.groupBy(col("l_suppkey").as("u"), col("l_partkey").as("i"))
        .agg(sum(col("l_quantity")).cast("long").as("r")))
    },
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
