package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** p-chart (attribute control chart) on the daily error rate — the
  * SRE/ops counterpart of w12's Gaussian z-score: error COUNTS are
  * binomial in the day's volume, so the control limits must widen on
  * quiet days and tighten on busy ones,
  *
  *   UCL/LCL = p̄ ± 3·√(p̄(1−p̄)/nᵢ),   p̄ = Σ errors / Σ events
  *
  * (per-day nᵢ in the denominator — the fixed-σ shortcut flags quiet
  * days spuriously). Counts are exact BIGINTs; p̄ is one division;
  * each day's limits and flag are fixed IEEE chains.
  *
  * Shape: ONE conditional fact aggregate to the calendar-bounded day
  * spine, a 1-row centre-line broadcast back over spine rows. One
  * scan at any scale.
  */
object PChart {

  private val q = Q(
    "w31_p_chart",
    (s, d) => {
      val daily = Tables(s, d).events
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("errs"))
        .localCheckpoint(false)
      val centre = daily.agg(sum(col("errs")).as("te"),
        sum(col("n")).as("tn"))
        .withColumn("pbar", expr("CAST(te AS DOUBLE) / CAST(tn AS DOUBLE)"))
        .select("pbar")
      daily.crossJoin(broadcast(centre))
        .withColumn("se", expr(
          "sqrt(pbar * (1.0 - pbar) / CAST(n AS DOUBLE))"))
        .select(col("day"), col("n"), col("errs"),
          round(expr("CAST(errs AS DOUBLE) / CAST(n AS DOUBLE)"), 6)
            .as("p"),
          round(col("pbar"), 6).as("p_bar"),
          round(expr("pbar + 3.0 * se"), 6).as("ucl"),
          round(expr("greatest(0.0, pbar - 3.0 * se)"), 6).as("lcl"),
          (expr("CAST(errs AS DOUBLE) / CAST(n AS DOUBLE)") >
            expr("pbar + 3.0 * se") ||
            expr("CAST(errs AS DOUBLE) / CAST(n AS DOUBLE)") <
              expr("greatest(0.0, pbar - 3.0 * se)")).as("out_of_control"))
    },
    Some(
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS errs
        |  FROM events GROUP BY 1),
        |centre AS (
        |  SELECT CAST(sum(errs) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS pbar
        |  FROM daily),
        |lim AS (
        |  SELECT *, sqrt(pbar * (1.0 - pbar) / CAST(n AS DOUBLE)) AS se
        |  FROM daily CROSS JOIN centre)
        |SELECT day, n, errs,
        |  round(CAST(errs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p,
        |  round(pbar, 6) AS p_bar,
        |  round(pbar + 3.0 * se, 6) AS ucl,
        |  round(greatest(0.0, pbar - 3.0 * se), 6) AS lcl,
        |  (CAST(errs AS DOUBLE) / CAST(n AS DOUBLE) > pbar + 3.0 * se
        |   OR CAST(errs AS DOUBLE) / CAST(n AS DOUBLE)
        |      < greatest(0.0, pbar - 3.0 * se)) AS out_of_control
        |FROM lim""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
