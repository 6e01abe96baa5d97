package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion-lag distribution — the "HOW LONG to convert" readout
  * completing the funnel family (e_funnel_steps says how many make
  * it, e_attribution who gets credit; this says how long it takes):
  * per user, days from first `view` to the first `purchase` at or
  * after it, then the exact nearest-rank P50/P90 of that lag plus
  * the conversion rate.
  *
  * EXACT: lags are integer days; the percentiles come from the
  * a54-style count-table cumulative window with nearest-rank picks
  * ⌈q·n⌉ (pure integer arithmetic — no interpolation, no doubles
  * anywhere in the row).
  *
  * Shape: two per-user min-aggregates (map-side combinable, keyed on
  * user_id so the second agg reuses the first's partitioning), then
  * everything runs on the ≤|distinct-lag| count table.
  */
object ConversionLag {

  private val Ppm = 1000000L

  private val q = Q(
    "e_conversion_lag",
    (s, d) => {
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          to_date(col("ts")).as("day"))
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("day")).as("v_day"))
      val lag = firstView.join(
        ev.filter(col("event_type") === "purchase"), Seq("user_id"))
        .filter(col("day") >= col("v_day"))
        .groupBy("user_id", "v_day")
        .agg(min(col("day")).as("p_day"))
        .select(datediff(col("p_day"), col("v_day")).as("lag_days"))
      val viewers = firstView.agg(count(lit(1)).as("n_viewers"))
      val ct = lag.groupBy("lag_days").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy("lag_days")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", sum(col("c")).over(Window.partitionBy()))
      val pick = ct.agg(max(col("n")).as("n_converted"),
        // integer `div`, never `/` (Spark's `/` on longs is a double)
        min(when(col("cum") >= expr("(n + 1) div 2"), col("lag_days")))
          .as("p50_days"),
        min(when(col("cum") * 10L >= col("n") * 9L, col("lag_days")))
          .as("p90_days"))
      pick.crossJoin(broadcast(viewers))
        .select(col("n_viewers"), col("n_converted"),
          expr(s"($Ppm * n_converted) div n_viewers")
            .as("conversion_ppm"),
          col("p50_days"), col("p90_days"))
    },
    Some(
      s"""WITH ev AS (
         |  SELECT user_id, event_type, CAST(ts AS DATE) AS day
         |  FROM events),
         |first_view AS (
         |  SELECT user_id, min(day) AS v_day FROM ev
         |  WHERE event_type = 'view' GROUP BY 1),
         |lag AS (
         |  SELECT date_diff('day', v_day, min(ev.day)) AS lag_days
         |  FROM first_view JOIN ev USING (user_id)
         |  WHERE ev.event_type = 'purchase' AND ev.day >= v_day
         |  GROUP BY user_id, v_day),
         |viewers AS (SELECT count(*) AS n_viewers FROM first_view),
         |ct AS (
         |  SELECT lag_days, count(*) AS c FROM lag GROUP BY 1),
         |cum AS (
         |  SELECT lag_days, c,
         |    CAST(sum(c) OVER (ORDER BY lag_days
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum,
         |    CAST(sum(c) OVER () AS BIGINT) AS n
         |  FROM ct),
         |pick AS (
         |  SELECT max(n) AS n_converted,
         |    min(CASE WHEN cum >= (n + 1) // 2 THEN lag_days END)
         |      AS p50_days,
         |    min(CASE WHEN cum * 10 >= n * 9 THEN lag_days END)
         |      AS p90_days
         |  FROM cum)
         |SELECT n_viewers, n_converted,
         |  ($Ppm * n_converted) // n_viewers AS conversion_ppm,
         |  CAST(p50_days AS INTEGER) AS p50_days,
         |  CAST(p90_days AS INTEGER) AS p90_days
         |FROM pick CROSS JOIN viewers""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
