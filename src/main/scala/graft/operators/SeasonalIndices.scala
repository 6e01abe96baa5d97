package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Classical month-of-year seasonal indices — the decomposition a
  * forecaster applies before w15's Holt trend: index(m) = mean daily
  * volume in calendar month m / grand mean daily volume, the
  * multiplicative seasonal profile (w30 tests WHETHER weekly
  * structure exists; this row quantifies the monthly profile for
  * deseasonalising). Daily counts exact BIGINT; the twelve month
  * means and the grand mean are exact rationals; each index is one
  * IEEE division chain.
  *
  * Shape: fact → day spine → 12-row month agg + 1-row grand mean
  * broadcast. One scan at any scale.
  */
object SeasonalIndices {

  private val q = Q(
    "w32_seasonal_indices",
    (s, d) => {
      val daily = Tables(s, d).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("y"))
        .localCheckpoint(false)
      val grand = daily.agg(sum(col("y")).as("ty"), count(lit(1)).as("td"))
      daily.groupBy(month(col("day")).cast("long").as("month"))
        .agg(sum(col("y")).as("my"), count(lit(1)).as("md"))
        .crossJoin(broadcast(grand))
        .select(col("month"), col("md").as("n_days"),
          round(expr(
            "(CAST(my AS DOUBLE) / CAST(md AS DOUBLE)) " +
              "/ (CAST(ty AS DOUBLE) / CAST(td AS DOUBLE))"), 6)
            .as("seasonal_index"))
    },
    Some(
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
        |  FROM orders GROUP BY 1),
        |grand AS (
        |  SELECT CAST(sum(y) AS BIGINT) AS ty, count(*) AS td FROM daily)
        |SELECT CAST(month(day) AS BIGINT) AS month, count(*) AS n_days,
        |  round((CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |    / (CAST(ty AS DOUBLE) / CAST(td AS DOUBLE)), 6)
        |    AS seasonal_index
        |FROM daily CROSS JOIN grand
        |GROUP BY month(day), ty, td""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
