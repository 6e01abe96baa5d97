package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weekly stock-FLOW decomposition — entries, exits, and the running
  * stock they net to. The reference reports the weekly STOCK level
  * (`dqa/data_getters.py:100-117`, our `w1`/`dom_weekly_stock`); the
  * flow view answers the question the level hides: is a flat stock a
  * quiet market or high churn? An ad enters in its posting week and
  * exits the week its [[LifespanDays]]-day lifespan lapses; stock(w) =
  * Σ entries − Σ exits is EXACTLY the sliding-window count at the week
  * grain, but computed from two |weeks|-sized aggregates + one
  * cumulative window instead of a 6-way window fanout — the
  * incremental formulation a ticking dashboard maintains.
  *
  * Weeks are pure arithmetic (days-since-epoch div 7) — no engine
  * week-start convention in the gate.
  */
object StockFlow {

  val LifespanDays = 42

  private val q = Q(
    "w24_stock_flow",
    (s, d) => {
      val o = Tables(s, d).orders
      val enters = o.select(
        expr("datediff(o_orderdate, DATE '1970-01-05') div 7").as("week"))
        .groupBy("week").agg(count(lit(1)).as("entries"))
      val exits = o.select(
        expr(s"datediff(date_add(o_orderdate, ${LifespanDays + 1}), " +
          "DATE '1970-01-05') div 7").as("week"))
        .groupBy("week").agg(count(lit(1)).as("exits"))
      val w = Window.orderBy("week")
        .rowsBetween(Window.unboundedPreceding, 0)
      enters.join(exits, Seq("week"), "full_outer")
        .select(col("week"),
          coalesce(col("entries"), lit(0L)).as("entries"),
          coalesce(col("exits"), lit(0L)).as("exits"))
        .withColumn("stock",
          sum(col("entries") - col("exits")).over(w))
        .withColumn("week_start",
          expr("date_add(DATE '1970-01-05', cast(week * 7 AS INT))"))
    },
    Some(
      s"""WITH enters AS (
         |  SELECT datediff('day', DATE '1970-01-05', o_orderdate) // 7
         |    AS week, count(*) AS entries
         |  FROM orders GROUP BY 1),
         |exits AS (
         |  SELECT datediff('day', DATE '1970-01-05',
         |    o_orderdate + INTERVAL ${LifespanDays + 1} DAY) // 7
         |    AS week, count(*) AS exits
         |  FROM orders GROUP BY 1),
         |flows AS (
         |  SELECT coalesce(enters.week, exits.week) AS week,
         |    coalesce(entries, 0) AS entries,
         |    coalesce(exits, 0) AS exits
         |  FROM enters FULL OUTER JOIN exits ON enters.week = exits.week)
         |SELECT CAST(week AS BIGINT) AS week, entries, exits,
         |  CAST(sum(entries - exits) OVER (ORDER BY week
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS stock,
         |  CAST(DATE '1970-01-05' + to_days(CAST(week * 7 AS INT))
         |    AS DATE) AS week_start
         |FROM flows""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
