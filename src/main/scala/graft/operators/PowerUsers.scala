package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Power-user curve (the "L28" histogram) — the engagement-depth
  * readout beside e_dau_stickiness's breadth series: over the final
  * 28 days, how many users were active on exactly d days
  * (d = 1..28), what share of the user base is that, and what
  * cumulative share is at-least-d-days active (read from the heavy
  * end — a healthy product shows the smile, not the cliff).
  *
  * EXACT: user-day distinct → per-user day count → |28|-row
  * histogram; shares as ppm integer `div`; the at-least-d cumulative
  * is a descending-window BIGINT sum. Shape: the fact scan collapses
  * to distinct user-days immediately (one agg), then per-user counts
  * (second agg keyed by user) — both map-side combinable; everything
  * after runs on ≤28 rows.
  */
object PowerUsers {

  private val Ppm = 1000000L

  private val q = Q(
    "e_power_user_curve",
    (s, d) => {
      val ev = Tables(s, d).events
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val maxd = ev.agg(max(col("day")).as("d1"))
      val perUser = ev.crossJoin(broadcast(maxd))
        .filter(col("day") > date_sub(col("d1"), 28))
        .select(col("user_id"), col("day")).distinct()
        .groupBy("user_id").agg(count(lit(1)).as("active_days"))
      val hist = perUser.groupBy("active_days")
        .agg(count(lit(1)).as("n_users"))
      hist
        .withColumn("total", sum(col("n_users")).over(
          Window.partitionBy()))
        .withColumn("at_least", sum(col("n_users")).over(
          Window.orderBy(col("active_days").desc)
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("active_days"), col("n_users"),
          expr(s"($Ppm * n_users) div total").as("share_ppm"),
          col("at_least"),
          expr(s"($Ppm * at_least) div total").as("at_least_ppm"))
        .orderBy("active_days")
    },
    Some(
      s"""WITH ev AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         |maxd AS (SELECT max(day) AS d1 FROM ev),
         |per_user AS (
         |  SELECT user_id, count(DISTINCT day) AS active_days
         |  FROM ev CROSS JOIN maxd
         |  WHERE day > d1 - 28
         |  GROUP BY 1),
         |hist AS (
         |  SELECT active_days, count(*) AS n_users FROM per_user
         |  GROUP BY 1),
         |c AS (
         |  SELECT active_days, n_users,
         |    CAST(sum(n_users) OVER () AS BIGINT) AS total,
         |    CAST(sum(n_users) OVER (ORDER BY active_days DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS at_least
         |  FROM hist)
         |SELECT active_days, n_users,
         |  ($Ppm * n_users) // total AS share_ppm,
         |  at_least,
         |  ($Ppm * at_least) // total AS at_least_ppm
         |FROM c ORDER BY active_days""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
