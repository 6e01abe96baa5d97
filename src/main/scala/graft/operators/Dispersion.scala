package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Poisson overdispersion check on daily event volume — the
  * diagnostic run BEFORE a85's two-rate Poisson z-test is believed
  * (that test assumes var = mean; real traffic is usually
  * overdispersed, and then a85's z is anti-conservative). The index
  * of dispersion D = s²/x̄ over the daily-count spine, with the χ²
  * statistic (n−1)·D that referees the Poisson assumption.
  *
  * Daily counts are exact BIGINTs; n, Σy, Σy² are one spine
  * aggregate; D and χ² are 1-row IEEE chains — no decimal folds
  * needed because every sufficient statistic is already integral.
  *
  * Shape: ONE fact aggregate to the calendar-bounded day spine, one
  * 3-number reduce. At 100 TB still a single corpus scan.
  */
object Dispersion {

  private val q = Q(
    "a91_dispersion_index",
    (s, d) =>
      Tables(s, d).events
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("y"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"))
        .selectExpr("n", "sy AS total",
          "round((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) " +
            "/ (CAST(n AS DOUBLE) - 1.0) / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS dispersion",
          "round((CAST(n AS DOUBLE) - 1.0) * " +
            "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) " +
            "/ (CAST(n AS DOUBLE) - 1.0) / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS chi2"),
    Some(
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS y
        |  FROM events GROUP BY 1),
        |red AS (
        |  SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM daily)
        |SELECT n, sy AS total,
        |  round((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - 1.0) / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS dispersion,
        |  round((CAST(n AS DOUBLE) - 1.0) *
        |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - 1.0) / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS chi2
        |FROM red""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
