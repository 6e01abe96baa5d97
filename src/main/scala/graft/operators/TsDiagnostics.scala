package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stationarity / whiteness diagnostics completing the time-series
  * family: Ljung–Box portmanteau (is anything LEFT in the residual
  * correlations w20's ACF displays?) and the lag-0 Dickey–Fuller
  * regression (is the series unit-root non-stationary — the test
  * run before trusting any of the trend/forecast rows).
  *
  * Both collapse to the |days| spine first. Ljung–Box uses the
  * textbook common-mean autocovariances (ȳ is one exact-rational
  * divide; per-lag products are fixed IEEE from it, summed through
  * decimal casts), Q = n(n+2)·Σ r_k²/(n−k). Dickey–Fuller regresses
  * Δy_t on y_{t−1} with intercept — every sufficient statistic an
  * exact BIGINT, the ρ̂/SE chain a fixed order of IEEE ops.
  */
object TsDiagnostics {

  val LbLags = 10

  private def daily(t: Tables) = t.orders
    .groupBy(to_date(col("o_orderdate")).as("day"))
    .agg(count(lit(1)).as("y"))

  private val ljungBox = Q(
    "a70_ljung_box",
    (s, d) => {
      val ds = daily(Tables(s, d)).localCheckpoint(false)
      val stats = ds.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      val w = Window.orderBy("day")
      val dev = ds.crossJoin(broadcast(stats))
        .select(col("day"), col("n"),
          (col("y").cast("double") -
            col("sy").cast("double") / col("n").cast("double")).as("e"))
      val lagged = dev.select(
        (Seq(col("n"), col("e")) ++ (1 to LbLags).map(l =>
          lag(col("e"), l).over(w).as(s"e$l"))): _*)
      val aggCols = Seq(
        Stable.dsum(col("e") * col("e"), 9).as("c0")) ++
        (1 to LbLags).map(l =>
          Stable.dsum(when(col(s"e$l").isNotNull,
            col("e") * col(s"e$l")).otherwise(0.0), 9).as(s"c$l"))
      val sums = lagged.agg(max(col("n")).as("n"), aggCols: _*)
      val qExpr = (1 to LbLags).map { l =>
        s"(c$l / c0) * (c$l / c0) / CAST(n - $l AS DOUBLE)"
      }.mkString(" + ")
      sums.select(col("n"), lit(LbLags).as("h"),
        round(expr(
          s"CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * ($qExpr)"), 6)
          .as("q"))
    },
    Some {
      val lagCols = (1 to LbLags)
        .map(l => s"lag(e, $l) OVER (ORDER BY day) AS e$l").mkString(", ")
      val covSums = (1 to LbLags).map(l =>
        s"""CAST(sum(CAST(CASE WHEN e$l IS NOT NULL THEN e * e$l
           |  ELSE 0.0 END AS DECIMAL(30,9))) AS DOUBLE) AS c$l"""
          .stripMargin).mkString(",\n  ")
      val qTerms = (1 to LbLags).map(l =>
        s"(c$l / c0) * (c$l / c0) / CAST(n - $l AS DOUBLE)")
        .mkString(" + ")
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
         |  FROM orders GROUP BY 1),
         |stats AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS sy
         |          FROM daily),
         |dev AS (
         |  SELECT day, n,
         |    CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
         |      AS e
         |  FROM daily CROSS JOIN stats),
         |lagged AS (SELECT n, e, $lagCols FROM dev),
         |sums AS (
         |  SELECT max(n) AS n,
         |    CAST(sum(CAST(e * e AS DECIMAL(30,9))) AS DOUBLE) AS c0,
         |  $covSums
         |  FROM lagged)
         |SELECT n, $LbLags AS h,
         |  round(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
         |    * ($qTerms), 6) AS q
         |FROM sums""".stripMargin
    },
  )

  private val dickeyFuller = Q(
    "a71_dickey_fuller",
    (s, d) => {
      val ds = daily(Tables(s, d))
      val w = Window.orderBy("day")
      val pairs = ds
        .select(col("y"), lag(col("y"), 1).over(w).as("x"))
        .filter(col("x").isNotNull)
        .select(col("x"), (col("y") - col("x")).as("z"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val sums = pairs.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("z")).as("sz"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("x")) * dec(col("z"))).as("sxz"),
        sum(dec(col("z")) * dec(col("z"))).as("szz"))
      sums.select(col("n"),
          ((dec(col("n")) * col("sxz") - dec(col("sx")) * dec(col("sz")))
            .cast("double") /
            (dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
              .cast("double")).as("rho"),
          col("sx"), col("sz"), col("sxx"), col("sxz"), col("szz"))
        .select(col("n"), round(col("rho"), 6).as("rho"),
          // SSE = Σz² − α̂Σz − ρ̂Σxz with α̂ = (Σz − ρ̂Σx)/n; then
          // t = ρ̂ / sqrt(s²·n / (nΣxx − Σx²)), s² = SSE/(n−2)
          round(col("rho") / sqrt(
            ((col("szz").cast("double") -
              ((col("sz").cast("double") -
                col("rho") * col("sx").cast("double")) /
                col("n").cast("double")) * col("sz").cast("double") -
              col("rho") * col("sxz").cast("double")) /
              (col("n") - 2).cast("double")) *
              col("n").cast("double") /
              (dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
                .cast("double")), 6).as("df_t"))
    },
    Some(
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT x, y - x AS z FROM (
        |    SELECT y, lag(y) OVER (ORDER BY day) AS x FROM daily)
        |  WHERE x IS NOT NULL),
        |sums AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(z) AS BIGINT) AS sz,
        |    sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
        |      AS sxx,
        |    sum(CAST(x AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0)))
        |      AS sxz,
        |    sum(CAST(z AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0)))
        |      AS szz
        |  FROM pairs),
        |fit AS (
        |  SELECT n, sx, sz, sxx, sxz, szz,
        |    CAST(CAST(n AS DECIMAL(38,0)) * sxz
        |        - CAST(sx AS DECIMAL(38,0)) * CAST(sz AS DECIMAL(38,0))
        |      AS DOUBLE)
        |    / CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |        - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))
        |      AS DOUBLE) AS rho
        |  FROM sums)
        |SELECT n, round(rho, 6) AS rho,
        |  round(rho / sqrt(
        |    ((CAST(szz AS DOUBLE)
        |      - ((CAST(sz AS DOUBLE) - rho * CAST(sx AS DOUBLE))
        |          / CAST(n AS DOUBLE)) * CAST(sz AS DOUBLE)
        |      - rho * CAST(sxz AS DOUBLE)) / CAST(n - 2 AS DOUBLE))
        |    * CAST(n AS DOUBLE)
        |    / CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |        - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))
        |      AS DOUBLE)), 6) AS df_t
        |FROM fit""".stripMargin),
  )

  def all: Seq[Q] = Seq(ljungBox, dickeyFuller)
}
