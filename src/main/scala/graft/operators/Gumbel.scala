package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Gumbel extreme-value fit on monthly block maxima of daily order
  * volume — the capacity-planning question none of the mean-centric
  * rows answer ("how big does a PEAK day get?"). Block maxima of a
  * light-tailed daily count converge to a Gumbel; the
  * method-of-moments fit is
  *
  *   β̂ = s·√6/π,   μ̂ = m − γ·β̂
  *
  * (m, s over the |months| maxima; γ Euler–Mascheroni), and the
  * fitted exceedance probability of the observed all-time max is
  * 1 − exp(−exp(−(max−μ̂)/β̂)). π and γ are embedded as the SAME
  * decimal literals in both engines; √6 is a correctly-rounded sqrt;
  * the moment sums are exact BIGINTs (maxima are integer counts).
  *
  * Shape: fact → day spine → month maxima (calendar-bounded) → one
  * 4-number reduce. One scan at any scale.
  */
object Gumbel {

  private val Pi = "3.141592653589793"
  private val EulerGamma = "0.5772156649015329"

  // shared textual chains — identical strings run in Spark and DuckDB
  private val MChain = "CAST(sy AS DOUBLE) / CAST(n_months AS DOUBLE)"
  private val SChain =
    "sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) " +
      "/ CAST(n_months AS DOUBLE)) / (CAST(n_months AS DOUBLE) - 1.0))"
  private def BetaChain = s"s * sqrt(6.0) / CAST($Pi AS DOUBLE)"
  private def MuChain = s"m - CAST($EulerGamma AS DOUBLE) * beta"
  private val fin = Seq(
    "n_months",
    "round(mu, 6) AS mu",
    "round(beta, 6) AS beta",
    "mx AS observed_max",
    "round(1.0 - exp(-exp(-((CAST(mx AS DOUBLE) - mu) / beta))), 6) " +
      "AS p_exceed_max",
  )

  private val q = Q(
    "w29_gumbel_maxima",
    (s, d) => {
      val maxima = Tables(s, d).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("y"))
        .groupBy(trunc(col("day"), "month").as("month"))
        .agg(max(col("y")).as("ymax"))
      maxima
        .agg(count(lit(1)).as("n_months"), sum(col("ymax")).as("sy"),
          sum(col("ymax") * col("ymax")).as("syy"),
          max(col("ymax")).as("mx"))
        .withColumn("m", expr(MChain))
        .withColumn("s", expr(SChain))
        .withColumn("beta", expr(BetaChain))
        .withColumn("mu", expr(MuChain))
        .selectExpr(fin: _*)
    },
    Some(
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
         |  FROM orders GROUP BY 1),
         |maxima AS (
         |  SELECT date_trunc('month', day) AS month, max(y) AS ymax
         |  FROM daily GROUP BY 1),
         |red AS (
         |  SELECT count(*) AS n_months, CAST(sum(ymax) AS BIGINT) AS sy,
         |    CAST(sum(ymax * ymax) AS BIGINT) AS syy, max(ymax) AS mx
         |  FROM maxima),
         |mo AS (SELECT *, $MChain AS m, $SChain AS s FROM red),
         |fit AS (SELECT *, $BetaChain AS beta FROM mo),
         |fit2 AS (SELECT *, $MuChain AS mu FROM fit)
         |SELECT ${fin.mkString(", ")} FROM fit2""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
