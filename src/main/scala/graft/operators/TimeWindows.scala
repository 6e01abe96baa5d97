package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

/** Time-window machinery (SURVEY.md §2.5 W1–W3): the reference's 6-week/
  * 1-week sliding "stock" windows (dqa/data_getters.py:100-117), the
  * 8-week/4-week dedup blocking windows (flows/enrich/deduplication_utils
  * .py:20-33), and monthly snapshot anchors (dqa/data_getters.py:125-141).
  *
  * Pure date logic lives in plain Scala over java.time (unit-testable with
  * the reference's golden values); the distributed form is Spark's native
  * `window()` — each row lands in length/slide windows via map-side
  * expansion, no self-join, no driver loop.
  */
object TimeWindows {

  /** Monday of the ISO week containing `d` (ref: monday_of_week). */
  def mondayOfWeek(d: LocalDate): LocalDate =
    d.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))

  /** All (end - span, end) windows whose `end` walks the Mondays from
    * mondayOfWeek(from) to mondayOfWeek(to) inclusive — exact semantics
    * of the reference's `iterdates` (dqa/data_getters.py:105-117),
    * golden-tested against its expected list.
    */
  def iterdates(
      from: LocalDate,
      to: LocalDate,
      timespanWeeks: Int = 6,
  ): Seq[(LocalDate, LocalDate)] = {
    val lastEnd = mondayOfWeek(to)
    Iterator
      .iterate(mondayOfWeek(from))(_.plusWeeks(1))
      .takeWhile(!_.isAfter(lastEnd))
      .map(e => (e.minusWeeks(timespanWeeks.toLong), e))
      .toSeq
  }

  /** Snapshot anchor: 15th of the previous month (ref: dqa/data_getters
    * .py:125-141); the snapshot window is the 42 days ending there.
    */
  def snapshotAnchor(today: LocalDate): LocalDate =
    today.minusMonths(1).withDayOfMonth(15)

  /** A one-column DataFrame date spine [from, to] stepped by `stepDays` —
    * generated distributed (sequence+explode), not collected on the driver.
    */
  def dateSpine(spark: SparkSession, from: LocalDate, to: LocalDate,
      stepDays: Int = 7): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        lit(java.sql.Date.valueOf(from)),
        lit(java.sql.Date.valueOf(to)),
        expr(s"interval $stepDays days"))).as("spine_date"))

  // ---- verifiable queries ----

  // DuckDB replica of the epoch-aligned window assignment: a row at t
  // belongs to the 6 grid-aligned starts floor(t/7d)*7d - k*7d, k=0..5.
  // Shared with the streaming twin (w1_streaming_parity), which must
  // reproduce the identical result from a file stream.
  private[graft] val slidingStockSql =
    """SELECT CAST(make_timestamp(CAST((floor(epoch(o_orderdate)/604800)*604800
      |         - k*604800) AS BIGINT) * 1000000) AS DATE) AS ws,
      |       count(*) AS n
      |FROM orders, (SELECT unnest([0,1,2,3,4,5]) AS k)
      |GROUP BY 1""".stripMargin

  private val w1 = Q(
    "w1_sliding_window_stock",
    (s, d) =>
      // 6-week windows sliding weekly over order dates — Spark's native
      // sliding window (epoch-aligned); each row expands map-side into
      // exactly length/slide = 6 windows, then one hash aggregate.
      Tables(s, d).orders
        .groupBy(window(col("o_orderdate"), "42 days", "7 days"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("date").as("ws"), col("n")),
    Some(slidingStockSql),
  )

  private val w2 = Q(
    "w2_dedup_blocking_windows",
    (s, d) =>
      // 8-week windows sliding by 4 weeks (dedup temporal blocking)
      Tables(s, d).events
        .groupBy(window(col("ts"), "56 days", "28 days"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("date").as("ws"), col("event_type"),
          col("n")),
    Some(
      """SELECT CAST(make_timestamp(CAST((floor(epoch(ts)/2419200)*2419200
        |         - k*2419200) AS BIGINT) * 1000000) AS DATE) AS ws,
        |       event_type, count(*) AS n
        |FROM events, (SELECT unnest([0,1]) AS k)
        |GROUP BY 1, 2""".stripMargin),
  )

  private val w3 = Q(
    "w3_tumbling_window",
    (s, d) =>
      Tables(s, d).events
        .groupBy(window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("n"),
          graft.util.Stable.dsum(col("value")).as("sum_value"))
        .select(col("window.start").cast("date").as("ws"), col("n"),
          col("sum_value")),
    Some(
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS ws, count(*) AS n,
         |  ${graft.util.Stable.dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1""".stripMargin),
  )

  private val w3b = Q(
    "w3_snapshot_anchor",
    (s, d) =>
      // monthly snapshot anchor: 15th of the previous month, window =
      // the 42 days up to it (ref dqa/data_getters.py:125-141)
      Tables(s, d).orders
        .select(date_trunc("month", col("o_orderdate")).cast("date")
          .as("mo")).distinct()
        .withColumn("anchor",
          date_add(add_months(col("mo"), -1), 14))
        .withColumn("window_from", date_sub(col("anchor"), 42)),
    Some(
      """SELECT mo,
        |  CAST(date_trunc('month', mo) - INTERVAL 1 MONTH
        |    + INTERVAL 14 DAY AS DATE) AS anchor,
        |  CAST(date_trunc('month', mo) - INTERVAL 1 MONTH
        |    + INTERVAL 14 DAY - INTERVAL 42 DAY AS DATE) AS window_from
        |FROM (
        |  SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo
        |  FROM orders)""".stripMargin),
  )

  /** SCD2 validity intervals: each key's change events become
    * [valid_from, valid_to) ranges with a current-row flag — the
    * slowly-changing-dimension history shape every warehouse carries.
    * One window per key (lead over the key's own events); nothing
    * global.
    */
  private val w9 = Q(
    "w9_scd2_intervals",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, d).orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("valid_to",
          lead(col("o_orderdate"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").as("valid_from"), col("valid_to"),
          col("is_current"))
    },
    Some(
      """SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
        |  lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM orders""".stripMargin),
  )

  /** EWMA smoothing of a per-key weekly series — the trend-smoothing
    * step indicator pipelines run after the weekly counts (the reference
    * plots raw weeklies; a monitoring pipeline smooths them). The
    * recursive EWMA y_t = αx_t + (1-α)y_(t-1) is inherently sequential;
    * this is its 8-term windowed expansion with α = 1/4, whose weights
    * (1/4)(3/4)^k are EXACT decimals (3^k/2^(2k+2)) — so the whole
    * smoother is one per-key window of lag() terms, embarrassingly
    * parallel across keys, and decimal arithmetic makes it bit-identical
    * across engines (a float EWMA would drift with evaluation order).
    * Missing lags at series start contribute 0 (the spec, mirrored in
    * SQL).
    */
  /** The weights (1/4)(3/4)^k are DYADIC rationals, so scaled by 2^16
    * they are exact integers 3^k·2^(14-2k): the whole smoother runs in
    * BIGINT arithmetic and the single final division by 65536.0 (a power
    * of two) is exact in binary floating point — no decimal-precision
    * negotiation in either engine. (The first cut used decimal weights:
    * Spark's allowPrecisionLoss truncated the 8-term fold's scale
    * 16 → 10, and DuckDB's decimal→double cast drifted 1 ulp on 187
    * rows. Integer units dodge both entire failure classes.)
    */
  private val ewmaUnitCoefs: Seq[Long] =
    (0 to 7).map(k => BigInt(3).pow(k).toLong << (14 - 2 * k))

  private val w11 = Q(
    "w11_ewma_smoothing",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority").orderBy("ws")
      val weekly = Tables(s, d).orders
        .groupBy(col("o_orderpriority"),
          date_trunc("week", col("o_orderdate")).cast("date").as("ws"))
        .agg(count(lit(1)).as("n"))
      val units = ewmaUnitCoefs.zipWithIndex.map { case (c, k) =>
        lit(c) * coalesce(lag(col("n"), k).over(w), lit(0L))
      }.reduce(_ + _)
      weekly.select(col("o_orderpriority"), col("ws"), col("n"),
        (units.cast("double") / lit(65536.0)).as("ewma"))
    },
    Some {
      val terms = ewmaUnitCoefs.zipWithIndex.map { case (c, k) =>
        s"$c * coalesce(lag(n, $k) OVER w, 0)"
      }.mkString("\n  + ")
      s"""WITH wk AS (
         |  SELECT o_orderpriority,
         |    CAST(date_trunc('week', o_orderdate) AS DATE) AS ws,
         |    count(*) AS n
         |  FROM orders GROUP BY 1, 2)
         |SELECT o_orderpriority, ws, CAST(n AS BIGINT) AS n,
         |  CAST($terms
         |  AS DOUBLE) / 65536.0 AS ewma
         |FROM wk
         |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY ws)""".stripMargin
    },
  )

  /** Binned point-in-interval range join — the general solution to the
    * join Spark has no native fast path for: `p BETWEEN s AND e` with NO
    * equi key degenerates to BroadcastNestedLoopJoin (O(n·m) compares,
    * and at 100 TB a non-starter). The fix is the standard range-join
    * binning: explode each interval to the fixed-width buckets it
    * overlaps, map each point to its single bucket, equi-join on the
    * bucket, re-check the exact range. Candidate pairs shrink from n·m
    * to Σ_bucket |points_b|·|intervals_b|, and because a POINT lives in
    * exactly one bucket, no (interval, point) pair can match twice — no
    * dedup stage. Bucket width = interval length (7 d) keeps the
    * per-interval explode at ≤ 2 rows.
    *
    * Demo query: for each 1-URGENT order's 7-day window in 1995, how
    * many R-flag lineitems shipped inside it (no key relates the two
    * sides). The oracle is the NAIVE theta join — DuckDB brute-forces
    * what the engine must get identical results to without ever
    * building the cartesian.
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binDays: Int): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val ivb = intervals.withColumn("bucket",
      explode(sequence(
        floor(datediff(col(startCol), epoch) / binDays),
        floor(datediff(date_sub(col(endCol), 1), epoch) / binDays))))
    val ptb = points.withColumn("bucket",
      floor(datediff(col(pointCol), epoch) / binDays))
    ivb.join(ptb,
      ivb("bucket") === ptb("bucket") &&
        ptb(pointCol) >= ivb(startCol) && ptb(pointCol) < ivb(endCol))
  }

  private val j14 = Q(
    "j14_range_join_binned",
    (s, d) => {
      val t = Tables(s, d)
      val iv = t.orders
        .filter(col("o_orderpriority") === "1-URGENT" &&
          year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("s"),
          date_add(to_date(col("o_orderdate")), 7).as("e"))
      val pts = t.lineitem
        .filter(col("l_returnflag") === "R" &&
          year(col("l_shipdate")) === 1995)
        .select(to_date(col("l_shipdate")).as("p"))
      binnedRangeJoin(pts, iv, "p", "s", "e", binDays = 7)
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_items"))
    },
    Some(
      """SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_items
        |FROM orders o JOIN lineitem l
        |  ON CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
        | AND CAST(l.l_shipdate AS DATE)
        |     < CAST(o.o_orderdate AS DATE) + INTERVAL 7 DAY
        |WHERE o.o_orderpriority = '1-URGENT' AND year(o.o_orderdate) = 1995
        |  AND l.l_returnflag = 'R' AND year(l.l_shipdate) = 1995
        |GROUP BY 1""".stripMargin),
  )

  /** Rolling z-score anomaly flag over per-key daily counts — the
    * monitoring/alerting companion to the EWMA smoother (w11): each
    * day's count scored against the TRAILING 7-day window (current day
    * excluded, so an anomaly can't suppress itself). Determinism: the
    * window sums s1=Σx, s2=Σx² are exact BIGINTs, and
    * z = (x·m − s1)/√(s2·m − s1²) is three IEEE ops on them — identical
    * bits on any engine, no incremental float variance. The σ=0 case
    * (all window counts equal) floors the variance term at 1 so z stays
    * finite. Per-key windows ⇒ embarrassingly parallel; the daily
    * pre-aggregation is the only corpus-sized shuffle.
    */
  private val w12 = Q(
    "w12_rolling_zscore",
    (s, d) => {
      val daily = Tables(s, d).events
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
        .rowsBetween(-7, -1)
      val num = col("x").cast("double") * col("m") - col("s1")
      val den = sqrt(greatest(
        col("s2").cast("double") * col("m") -
          col("s1").cast("double") * col("s1"), lit(1.0)))
      daily
        .withColumn("s1", sum(col("x")).over(w))
        .withColumn("s2", sum(col("x") * col("x")).over(w))
        .withColumn("m", count(lit(1)).over(w))
        .filter(col("m") === 7)
        .select(col("event_type"), col("day"), col("x"),
          round(num / den, 4).as("z"),
          (abs(num / den) > 2.0).as("is_anomaly"))
    },
    Some(
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, day, x,
        |    CAST(sum(x) OVER w AS BIGINT) AS s1,
        |    CAST(sum(x*x) OVER w AS BIGINT) AS s2,
        |    CAST(count(*) OVER w AS BIGINT) AS m
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, x,
        |  round((CAST(x AS DOUBLE) * m - s1) /
        |    sqrt(greatest(CAST(s2 AS DOUBLE) * m
        |      - CAST(s1 AS DOUBLE) * s1, 1.0)), 4) AS z,
        |  abs((CAST(x AS DOUBLE) * m - s1) /
        |    sqrt(greatest(CAST(s2 AS DOUBLE) * m
        |      - CAST(s1 AS DOUBLE) * s1, 1.0))) > 2.0 AS is_anomaly
        |FROM win WHERE m = 7""".stripMargin),
  )

  /** Gap-fill + last-observation-carried-forward — the step every
    * time-series indicator needs between "aggregate per period" and
    * "publish": a customer with orders in Jan and Apr must contribute a
    * row for Feb/Mar (flagged as gaps, value carried forward), or the
    * downstream stock/trend math silently treats absence as zero. The
    * reference's weekly stock avoids this only because its `iterdates`
    * grid is dense by construction (dqa/data_getters.py:105-117); this
    * is the sparse-series general form.
    *
    * Scale shape: the spine is generated PER KEY from that key's own
    * [min, max] period (one small agg + a map-side sequence/explode —
    * never a global calendar crossJoin, which would be keys × all-time).
    * The LOCF fill is a per-key running `last(ignoreNulls)` window; both
    * stages partition by key, so the whole operator is two shuffles on
    * the same key and embarrassingly parallel across keys.
    */
  private val w14 = Q(
    "w14_gapfill_locf",
    (s, d) => {
      val monthly = Tables(s, d).orders
        .groupBy(col("o_custkey"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mo"))
        .agg(count(lit(1)).as("n"))
      val spine = monthly.groupBy("o_custkey")
        .agg(min(col("mo")).as("mn"), max(col("mo")).as("mx"))
        .select(col("o_custkey"),
          explode(sequence(col("mn"), col("mx"),
            expr("interval 1 month"))).as("mo"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("mo")
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      spine.join(monthly, Seq("o_custkey", "mo"), "left")
        .select(col("o_custkey"), col("mo"),
          col("n").isNull.as("is_gap"),
          last(col("n"), ignoreNulls = true).over(w).as("n_filled"))
    },
    Some(
      """WITH monthly AS (
        |  SELECT o_custkey,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
        |    count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |spine AS (
        |  SELECT o_custkey,
        |    CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
        |      CAST(mx AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS mo
        |  FROM (SELECT o_custkey, min(mo) AS mn, max(mo) AS mx
        |        FROM monthly GROUP BY 1))
        |SELECT s.o_custkey, s.mo, m.n IS NULL AS is_gap,
        |  CAST(last_value(m.n IGNORE NULLS) OVER (
        |    PARTITION BY s.o_custkey ORDER BY s.mo
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS BIGINT) AS n_filled
        |FROM spine s LEFT JOIN monthly m
        |  ON s.o_custkey = m.o_custkey AND s.mo = m.mo""".stripMargin),
  )

  def all: Seq[Q] = Seq(w1, w2, w3, w3b, w9, w11, j14, w12, w14)
}
