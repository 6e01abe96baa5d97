package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Durbin–Watson first-order residual-autocorrelation test on the
  * daily order-volume trend — the regression diagnostic a70/a71
  * don't cover (those test the raw series; DW asks whether the
  * RESIDUALS of the fitted trend are serially correlated, i.e.
  * whether the a29-style OLS standard errors can be believed):
  *
  *   DW = Σ_{t≥2} (e_t − e_{t−1})² / Σ e_t²,   e = y − (a + b·x)
  *
  * The OLS line is fit from five exact-BIGINT sufficient statistics
  * (x is the 1..n day index); the b/a chain and each residual are
  * fixed IEEE from them; both quadratic forms fold through 6-dp
  * decimal-stable sums.
  *
  * Shape: ONE fact aggregate to the calendar-bounded |days| spine,
  * a 1-row stats broadcast back, one lag window ON the spine. The
  * spine never grows with corpus size — at 100 TB this is still a
  * single fact scan plus arithmetic on a few thousand rows.
  */
object DurbinWatson {

  private val q = Q(
    "w28_durbin_watson",
    (s, d) => {
      val daily = Tables(s, d).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("y"))
        .select(col("day"), col("y"),
          row_number().over(Window.orderBy("day")).cast("long").as("x"))
        .localCheckpoint(false)
      val stats = daily.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
        .withColumn("b", expr(
          "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) " +
            "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"))
        .withColumn("a", expr(
          "(CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"))
      val res = daily.crossJoin(broadcast(stats))
        .withColumn("e", expr("CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE))"))
        .withColumn("el", lag(col("e"), 1).over(Window.orderBy("day")))
      res.agg(max(col("n")).as("n"),
        max(round(col("b"), 6)).as("slope"),
        (Stable.dsum(when(col("el").isNotNull,
          (col("e") - col("el")) * (col("e") - col("el"))).otherwise(0.0), 6) /
          Stable.dsum(col("e") * col("e"), 6)).as("dwr"))
        .select(col("n"), col("slope"), round(col("dwr"), 6).as("dw"))
    },
    Some(
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
         |  FROM orders GROUP BY 1),
         |idx AS (
         |  SELECT day, y, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS x
         |  FROM daily),
         |st AS (
         |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM idx),
         |st2 AS (
         |  SELECT *,
         |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
         |  FROM st),
         |st3 AS (
         |  SELECT *, (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a
         |  FROM st2),
         |res AS (
         |  SELECT n, b, CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE)) AS e,
         |    lag(CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE)), 1)
         |      OVER (ORDER BY day) AS el
         |  FROM idx CROSS JOIN st3)
         |SELECT max(n) AS n, max(round(b, 6)) AS slope,
         |  round(${Stable.dsumSql("CASE WHEN el IS NOT NULL THEN (e - el) * (e - el) ELSE 0.0 END", 6)}
         |    / ${Stable.dsumSql("e * e", 6)}, 6) AS dw
         |FROM res""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
