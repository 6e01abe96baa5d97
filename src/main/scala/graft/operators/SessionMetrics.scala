package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session quality rollup — the product-analytics triple (bounce
  * rate, depth, duration) computed from the same 30-minute gap
  * sessions `w6` builds: a bounce is a single-event session, depth is
  * events per session, duration the first→last gap. All exact: session
  * islands from one per-user window, per-session integers, and the
  * global rollup emits exact numerators beside 6-dp display ratios.
  */
object SessionMetrics {

  val GapMinutes = 30

  private val q = Q(
    "e_session_metrics",
    (s, d) => {
      val e = Tables(s, d).events
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us")
      val gapUs = GapMinutes * 60L * 1000000L
      val sessions = e
        .withColumn("opener",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > gapUs, 1L)
            .otherwise(0L))
        .withColumn("island",
          sum(col("opener")).over(w.rowsBetween(
            Window.unboundedPreceding, 0)))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("depth"),
          (max(col("us")) - min(col("us"))).as("dur_us"))
      sessions.agg(
          count(lit(1)).as("n_sessions"),
          sum(when(col("depth") === 1, 1L).otherwise(0L)).as("n_bounces"),
          sum(col("depth")).as("n_events"),
          sum(col("dur_us")).as("dur_us_total"))
        .select(col("n_sessions"), col("n_bounces"), col("n_events"),
          col("dur_us_total"),
          round(col("n_bounces").cast("double") /
            col("n_sessions").cast("double"), 6).as("bounce_rate"),
          round(col("n_events").cast("double") /
            col("n_sessions").cast("double"), 6).as("mean_depth"),
          round(col("dur_us_total").cast("double") /
            col("n_sessions").cast("double"), 6).as("mean_dur_us"))
    },
    Some(
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS us FROM events),
         |marked AS (
         |  SELECT user_id, us,
         |    CASE WHEN lag(us) OVER w IS NULL
         |      OR us - lag(us) OVER w > ${GapMinutes * 60L * 1000000L}
         |    THEN 1 ELSE 0 END AS opener
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
         |islands AS (
         |  SELECT user_id, us,
         |    sum(opener) OVER (PARTITION BY user_id ORDER BY us
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS island
         |  FROM marked),
         |sess AS (
         |  SELECT user_id, island, count(*) AS depth,
         |    max(us) - min(us) AS dur_us
         |  FROM islands GROUP BY 1, 2),
         |agg AS (
         |  SELECT count(*) AS n_sessions,
         |    CAST(sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_bounces,
         |    CAST(sum(depth) AS BIGINT) AS n_events,
         |    CAST(sum(dur_us) AS BIGINT) AS dur_us_total
         |  FROM sess)
         |SELECT n_sessions, n_bounces, n_events, dur_us_total,
         |  round(CAST(n_bounces AS DOUBLE) / CAST(n_sessions AS DOUBLE),
         |    6) AS bounce_rate,
         |  round(CAST(n_events AS DOUBLE) / CAST(n_sessions AS DOUBLE),
         |    6) AS mean_depth,
         |  round(CAST(dur_us_total AS DOUBLE)
         |    / CAST(n_sessions AS DOUBLE), 6) AS mean_dur_us
         |FROM agg""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
