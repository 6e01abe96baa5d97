package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trend/seasonality operators over event-time series — the monitoring
  * layer a production feed adds on top of the weekly indicator tables
  * (reference anchor: the indicator publishing in
  * `ojd_daps/flows/aggregate/` computes raw weeklies; a drifting feed
  * needs the decomposition to tell trend breaks from day-of-week
  * rhythm). Both operators follow the house integer-exact discipline:
  * every aggregate is BIGINT algebra and each float column is a single
  * IEEE division of exact integers, so the gate hashes bit-identical
  * values on any engine and any partitioning.
  */
object Timeseries {

  // ---- Holt linear-trend smoothing (double exponential) ---------------

  /** Holt's linear recurrence (α = 1/2, β = 1/4)
    *
    *   l_t = α y_t + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}
    *
    * is inherently sequential — but like w11's EWMA it is LINEAR, so its
    * truncated expansion is a fixed-weight window filter:
    * (l_t, b_t) ≈ Σ_{k<10} F^k·g · y_{t−k} with F = [[1/2,1/2],
    * [−1/8,7/8]], g = (1/2,1/8). With DYADIC α, β the matrix powers are
    * exact dyadic rationals; scaled by the common denominator 8^10 = 2^30
    * they are exact BIGINTs, so the whole smoother is one per-key window
    * of lag() terms in integer arithmetic, embarrassingly parallel
    * across keys, and the single final division by 2^30 is exact in
    * binary floating point. Truncation at 10 taps (residual weight
    * < 0.8^10 ≈ 0.1 on the slowest mode) IS the operator's spec,
    * mirrored term-for-term in the oracle; missing lags at series start
    * contribute 0. The 3-step-ahead forecast l_t + 3·b_t rides the same
    * integer units.
    */
  val HoltTaps = 10

  /** (levelCoef_k, trendCoef_k) scaled by 2^30: F8^k · g8 · 8^(9−k)
    * with F8 = 8·F and g8 = 8·g integer matrices.
    */
  val holtUnitCoefs: Seq[(Long, Long)] = {
    val f8 = Array(Array(BigInt(4), BigInt(4)), Array(BigInt(-1), BigInt(7)))
    var m = Array(Array(BigInt(1), BigInt(0)), Array(BigInt(0), BigInt(1)))
    val out = Seq.newBuilder[(Long, Long)]
    for (k <- 0 until HoltTaps) {
      val wl = m(0)(0) * 4 + m(0)(1) * 1
      val wb = m(1)(0) * 4 + m(1)(1) * 1
      val s = BigInt(8).pow(HoltTaps - 1 - k)
      out += (((wl * s).toLong, (wb * s).toLong))
      m = Array(
        Array(f8(0)(0) * m(0)(0) + f8(0)(1) * m(1)(0),
          f8(0)(0) * m(0)(1) + f8(0)(1) * m(1)(1)),
        Array(f8(1)(0) * m(0)(0) + f8(1)(1) * m(1)(0),
          f8(1)(0) * m(0)(1) + f8(1)(1) * m(1)(1)))
    }
    out.result()
  }

  private val HoltDen = (1L << 30).toDouble

  private def dailyCounts(t: Tables): DataFrame =
    t.events
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))

  private val holt = Q(
    "w15_holt_linear",
    (s, d) => {
      val w = Window.partitionBy("event_type").orderBy("day")
      def units(pick: ((Long, Long)) => Long) =
        holtUnitCoefs.zipWithIndex.map { case (c, k) =>
          lit(pick(c)) * coalesce(lag(col("n"), k).over(w), lit(0L))
        }.reduce(_ + _)
      dailyCounts(Tables(s, d))
        .withColumn("l_units", units(_._1))
        .withColumn("b_units", units(_._2))
        .select(col("event_type"), col("day"), col("n"),
          (col("l_units").cast("double") / lit(HoltDen)).as("level"),
          (col("b_units").cast("double") / lit(HoltDen)).as("trend"),
          ((col("l_units") + lit(3L) * col("b_units")).cast("double") /
            lit(HoltDen)).as("forecast_3"))
    },
    Some {
      def terms(pick: ((Long, Long)) => Long) =
        holtUnitCoefs.zipWithIndex.map { case (c, k) =>
          s"${pick(c)} * coalesce(lag(n, $k) OVER w, 0)"
        }.mkString("\n    + ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |    count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |u AS (
         |  SELECT event_type, day, n,
         |    CAST(${terms(_._1)} AS BIGINT) AS lu,
         |    CAST(${terms(_._2)} AS BIGINT) AS bu
         |  FROM daily
         |  WINDOW w AS (PARTITION BY event_type ORDER BY day))
         |SELECT event_type, day, CAST(n AS BIGINT) AS n,
         |  CAST(lu AS DOUBLE) / ${HoltDen} AS level,
         |  CAST(bu AS DOUBLE) / ${HoltDen} AS trend,
         |  CAST(lu + 3 * bu AS DOUBLE) / ${HoltDen} AS forecast_3
         |FROM u""".stripMargin
    },
  )

  // ---- STL-style seasonal decomposition -------------------------------

  /** Classical decomposition of the per-type daily volume into
    * trend + day-of-week seasonal + residual (the moving-average STL
    * ancestor; Cleveland's STL replaces the MA with loess, which buys
    * robustness a monitoring gate doesn't need):
    *
    *   trend_t    = centered 7-day moving average (full windows only)
    *   seasonal_d = mean over detrended rows sharing day-of-week d
    *   residual_t = n_t − trend_t − seasonal_d(t)
    *
    * INTEGER-EXACT: the trend is carried as the exact window sum t7
    * (denominator 7), the detrended series as 7·n − t7, and the seasonal
    * as the exact rational (Σ detr7, 7·count). Each emitted float is one
    * IEEE division (or one fixed chain of subtractions) of those exact
    * integers, identical on both engines. Day-of-week is computed as
    * days-since-epoch mod 7 — engine-neutral integer arithmetic, immune
    * to the engines' dow-numbering disagreements. Scale: two window
    * passes + one 35-row broadcast join; nothing global.
    */
  /** Shared by `e_stl_decompose` and `e_stl_anomaly`: the decomposition
    * frame with exact integer carriers + the derived float columns.
    */
  private def stlFrame(t: Tables): DataFrame = {
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-3, 3)
      val base = dailyCounts(t)
        .withColumn("cnt7", count(lit(1)).over(w))
        .withColumn("t7", sum(col("n")).over(w))
        .filter(col("cnt7") === 7)
        .withColumn("dow",
          pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)))
        .withColumn("detr7", lit(7L) * col("n") - col("t7"))
      val seas = base.groupBy("event_type", "dow")
        .agg(sum(col("detr7")).as("s_num"), count(lit(1)).as("s_cnt"))
      base.join(broadcast(seas), Seq("event_type", "dow"))
        .select(col("event_type"), col("day"), col("n"),
          col("t7"), col("s_num"), col("s_cnt"),
          (col("t7").cast("double") / lit(7.0)).as("trend"),
          (col("s_num").cast("double") /
            (lit(7.0) * col("s_cnt").cast("double"))).as("seasonal"))
        .withColumn("residual",
          col("n").cast("double") - col("trend") - col("seasonal"))
  }

  /** The shared CTE prefix of the two STL oracles: everything up to the
    * per-row residual.
    */
  private val stlOracleCtes =
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, day, n,
        |    CAST(count(*) OVER w AS BIGINT) AS cnt7,
        |    CAST(sum(n) OVER w AS BIGINT) AS t7
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |full7 AS (
        |  SELECT event_type, day, n, t7,
        |    date_diff('day', DATE '1970-01-01', day) % 7 AS dow,
        |    7 * n - t7 AS detr7
        |  FROM win WHERE cnt7 = 7),
        |seas AS (
        |  SELECT event_type, dow, CAST(sum(detr7) AS BIGINT) AS s_num,
        |    count(*) AS s_cnt
        |  FROM full7 GROUP BY 1, 2),
        |resid AS (
        |  SELECT f.event_type, f.day, CAST(f.n AS BIGINT) AS n, f.t7,
        |    s.s_num, CAST(s.s_cnt AS BIGINT) AS s_cnt,
        |    CAST(f.t7 AS DOUBLE) / 7.0 AS trend,
        |    CAST(s.s_num AS DOUBLE) / (7.0 * CAST(s.s_cnt AS DOUBLE))
        |      AS seasonal,
        |    CAST(f.n AS DOUBLE) - (CAST(f.t7 AS DOUBLE) / 7.0)
        |      - (CAST(s.s_num AS DOUBLE) / (7.0 * CAST(s.s_cnt AS DOUBLE)))
        |      AS residual
        |  FROM full7 f JOIN seas s
        |    ON f.event_type = s.event_type AND f.dow = s.dow)""".stripMargin

  private val stl = Q(
    "e_stl_decompose",
    (s, d) => stlFrame(Tables(s, d)),
    Some(
      s"""$stlOracleCtes
         |SELECT * FROM resid""".stripMargin),
  )

  /** Anomaly gate on the STL residual — the detector the decomposition
    * exists to feed: a day is anomalous when its residual sits more
    * than `3` robust standard deviations from the per-series residual
    * median, with the robust sd estimated as 1.4826·MAD (the
    * normal-consistency constant). Median/MAD rather than mean/stddev
    * because the statistic must not be dragged by the very outliers it
    * is hunting — one bad deploy day would widen a stddev gate enough
    * to hide the next one.
    *
    * Determinism: residuals are the fixed IEEE chain from [[stlFrame]];
    * medians are exact (`percentile` ↔ `quantile_cont`, the `a4`
    * parity), and the score is one subtract-abs-divide chain — no
    * accumulation-order float anywhere. Scale: two tiny per-series
    * aggregates (series × days rows) broadcast back; the heavy lifting
    * was already paid by the shared daily rollup.
    */
  private val stlAnomaly = Q(
    "e_stl_anomaly",
    (s, d) => {
      val r = stlFrame(Tables(s, d))
        .select(col("event_type"), col("day"), col("n"), col("residual"))
      val med = r.groupBy("event_type")
        .agg(percentile(col("residual"), lit(0.5)).as("med"))
      val mad = r.join(broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(percentile(abs(col("residual") - col("med")), lit(0.5))
          .as("mad"))
      r.join(broadcast(mad), "event_type")
        .withColumn("score",
          abs(col("residual") - col("med")) / (lit(1.4826) * col("mad")))
        .withColumn("is_anomaly", col("score") > 3.0)
        .select(col("event_type"), col("day"), col("n"), col("residual"),
          col("med"), col("mad"), col("score"), col("is_anomaly"))
    },
    Some(
      s"""$stlOracleCtes,
         |med AS (
         |  SELECT event_type, quantile_cont(residual, 0.5) AS med
         |  FROM resid GROUP BY 1),
         |mad AS (
         |  SELECT r.event_type, m.med,
         |    quantile_cont(abs(r.residual - m.med), 0.5) AS mad
         |  FROM resid r JOIN med m USING (event_type)
         |  GROUP BY 1, 2)
         |SELECT r.event_type, r.day, r.n, r.residual, d.med, d.mad,
         |  abs(r.residual - d.med) / (1.4826 * d.mad) AS score,
         |  abs(r.residual - d.med) / (1.4826 * d.mad) > 3.0 AS is_anomaly
         |FROM resid r JOIN mad d USING (event_type)""".stripMargin),
  )

  // ---- MASE forecast-accuracy gate ------------------------------------

  /** Mean Absolute Scaled Error (Hyndman & Koehler 2006) of the
    * seasonal-naive forecaster (ŷ_t = y_{t−7}) against the in-sample
    * naive baseline (y_{t−1}) over each event type's daily volume — the
    * standard scale-free answer to "is the weekly rhythm actually
    * predictive for this series?". MASE < 1 means exploiting seasonality
    * beats carry-forward; a type drifting above 1 is the signal to
    * re-fit whatever model publishes its indicator.
    *
    * Exactness: both MAEs are kept as BIGINT sums over the SAME row set
    * (rows with a full 7-day history), and the ratio is one integer
    * floor-division in parts-per-million — no float accumulates.
    * Scale: one per-key window pass + one per-key aggregate; series key
    * count bounds the shuffle, never event count.
    */
  private val mase = Q(
    "e_forecast_mase",
    (s, d) => {
      val w = Window.partitionBy("event_type").orderBy("day")
      dailyCounts(Tables(s, d))
        .withColumn("l1", lag(col("n"), 1).over(w))
        .withColumn("l7", lag(col("n"), 7).over(w))
        .filter(col("l7").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("n") - col("l7"))).as("seasonal_abs_err"),
          sum(abs(col("n") - col("l1"))).as("naive_abs_err"))
        .withColumn("mase_ppm",
          expr("(1000000 * seasonal_abs_err) div naive_abs_err"))
    },
    Some(
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, n,
        |    lag(n, 1) OVER w AS l1, lag(n, 7) OVER w AS l7
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, count(*) AS n_days,
        |  CAST(sum(abs(n - l7)) AS BIGINT) AS seasonal_abs_err,
        |  CAST(sum(abs(n - l1)) AS BIGINT) AS naive_abs_err,
        |  (1000000 * CAST(sum(abs(n - l7)) AS BIGINT))
        |    // CAST(sum(abs(n - l1)) AS BIGINT) AS mase_ppm
        |FROM lagged WHERE l7 IS NOT NULL
        |GROUP BY 1""".stripMargin),
  )

  // ---- time-weighted average ------------------------------------------

  /** Time-weighted mean of a sampled value per series — the correct
    * mean when observations arrive irregularly (a value holds until the
    * next observation, so each sample weights by its holding interval;
    * the arithmetic mean over-weights bursts). The sensor/market-data
    * aggregation the evenly-spaced daily operators above don't cover.
    *
    * Exactness: values in milli-units, intervals in microseconds, the
    * weighted sum as BIGINT (fits ≈10⁵ milli × 10¹³ µs of series span;
    * beyond that swap the sum to DECIMAL(38,0), same plan) and ONE
    * floor-division at the end. Per-key window + agg; series count
    * bounds the shuffle.
    */
  private val twa = Q(
    "w16_time_weighted_avg",
    (s, d) => {
      val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      Tables(s, d).events
        .select(col("event_type"), col("event_id"), col("ts"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("vm"))
        .withColumn("dt_us",
          unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
        .filter(col("dt_us").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt_us")).as("span_us"),
          sum(col("vm") * col("dt_us")).as("vw"))
        .select(col("event_type"), col("n_intervals"), col("span_us"),
          expr("vw div span_us").as("twa_milli"))
    },
    Some(
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS vm,
        |    epoch_us(lead(ts, 1) OVER w) - epoch_us(ts) AS dt_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
        |SELECT event_type, count(*) AS n_intervals,
        |  CAST(sum(dt_us) AS BIGINT) AS span_us,
        |  CAST(sum(vm * dt_us) // sum(dt_us) AS BIGINT) AS twa_milli
        |FROM e WHERE dt_us IS NOT NULL
        |GROUP BY 1""".stripMargin),
  )

  def all: Seq[Q] = Seq(holt, stl, stlAnomaly, mase, twa)
}
