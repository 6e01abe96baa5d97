package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Day-of-week seasonality strength — the quick ANOVA-style answer
  * to "is there weekly structure worth modelling?" that decides
  * whether e_stl_decompose's period-7 fit is even warranted:
  *
  *   strength = 1 − SS_within/SS_total   (variance explained by dow)
  *   F = (SS_between/6) / (SS_within/(n−7))
  *
  * over the daily-count spine. Daily counts and the per-dow
  * n/Σy/Σy² are exact BIGINTs; the decomposition is the a86 cell-
  * moments identity (SS_between = Σ S_d²/n_d − S²/n) with every
  * term one IEEE chain on a ≤7-row frame.
  *
  * Shape: fact → day spine → 7-row dow aggregate → 1-row finale.
  * One scan at any scale.
  */
object DowSeasonality {

  private val q = Q(
    "w30_dow_seasonality",
    (s, d) => {
      val dow = Tables(s, d).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("y"))
        .groupBy(dayofweek(col("day")).as("dow"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"))
      dow.agg(sum(col("n")).as("nn"), sum(col("sy")).as("s"),
        sum(col("syy")).as("q"),
        graft.util.Stable.dsum(col("sy").cast("double") *
          col("sy").cast("double") / col("n").cast("double"), 0)
          .as("cellterm"))
        .selectExpr("nn AS n_days",
          "round(1.0 - (CAST(q AS DOUBLE) - cellterm) " +
            "/ (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(nn AS DOUBLE)), 6) AS strength",
          "round(((cellterm - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(nn AS DOUBLE)) / 6.0) " +
            "/ ((CAST(q AS DOUBLE) - cellterm) / CAST(nn - 7 AS DOUBLE)), 6) AS f_stat")
    },
    Some(
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
        |  FROM orders GROUP BY 1),
        |dow AS (
        |  SELECT dayofweek(day) AS dow, count(*) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM daily GROUP BY 1),
        |red AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sy) AS BIGINT) AS s,
        |    CAST(sum(syy) AS BIGINT) AS q,
        |    CAST(sum(CAST(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS DECIMAL(30,0))) AS DOUBLE) AS cellterm
        |  FROM dow)
        |SELECT nn AS n_days,
        |  round(1.0 - (CAST(q AS DOUBLE) - cellterm)
        |    / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(nn AS DOUBLE)), 6) AS strength,
        |  round(((cellterm - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(nn AS DOUBLE)) / 6.0)
        |    / ((CAST(q AS DOUBLE) - cellterm) / CAST(nn - 7 AS DOUBLE)), 6) AS f_stat
        |FROM red""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
