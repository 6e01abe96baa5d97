package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Capture–recapture population estimation (Chapman's bias-corrected
  * Lincoln–Petersen) — "how many customers exist, given two partial
  * observation windows?": the estimator dedup/coverage audits use
  * when NO window sees everyone. Customers ordering in the early
  * calendar half are the first capture (n₁), the late half the
  * second (n₂), both the marked recaptures (m):
  *
  *   N̂ = (n₁+1)(n₂+1)/(m+1) − 1,
  *   Var = (n₁+1)(n₂+1)(n₁−m)(n₂−m) / ((m+1)²(m+2))
  *
  * The calendar midpoint comes from a 1-row bounds aggregate
  * broadcast into the scan (the a77/a85 two-pass-collapsed shape);
  * all three counts are one distinct-flag aggregate; the estimate is
  * 1-row arithmetic on exact BIGINTs.
  *
  * Shape: one bounds agg + ONE per-customer flag agg + a 3-number
  * reduce — two fact scans total (the bounds scan prunes to the
  * date column), constant-size everything after.
  */
object CaptureRecapture {

  private val q = Q(
    "a94_capture_recapture",
    (s, d) => {
      val o = Tables(s, d).orders
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
      val bounds = o.agg(min(col("od")).as("lo"), max(col("od")).as("hi"))
        // `div` (not `/` + cast): double->int casting truncates in Spark
        // but rounds in DuckDB; integer division floors in both
        .select(date_add(col("lo"),
          expr("datediff(hi, lo) div 2").cast("int")).as("mid"))
      val flags = o.crossJoin(broadcast(bounds))
        .groupBy("o_custkey")
        .agg(max(when(col("od") < col("mid"), 1L).otherwise(0L))
          .as("early"),
          max(when(col("od") >= col("mid"), 1L).otherwise(0L))
            .as("late"))
      flags.agg(sum(col("early")).as("n1"), sum(col("late")).as("n2"),
        sum(col("early") * col("late")).as("m"))
        .selectExpr("n1", "n2", "m",
          "round(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE) " +
            "/ CAST(m + 1 AS DOUBLE) - 1.0, 6) AS n_hat",
          "round(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE) " +
            "* CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE) " +
            "/ (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE) " +
            "* CAST(m + 2 AS DOUBLE)), 6) AS var_hat")
    },
    Some(
      """WITH o AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders),
        |b AS (
        |  SELECT min(od)
        |    + CAST(datediff('day', min(od), max(od)) // 2 AS INTEGER) AS mid
        |  FROM o),
        |flags AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN od < mid THEN 1 ELSE 0 END) AS early,
        |    max(CASE WHEN od >= mid THEN 1 ELSE 0 END) AS late
        |  FROM o CROSS JOIN b GROUP BY 1),
        |red AS (
        |  SELECT CAST(sum(early) AS BIGINT) AS n1,
        |    CAST(sum(late) AS BIGINT) AS n2,
        |    CAST(sum(early * late) AS BIGINT) AS m
        |  FROM flags)
        |SELECT n1, n2, m,
        |  round(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
        |    / CAST(m + 1 AS DOUBLE) - 1.0, 6) AS n_hat,
        |  round(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
        |    * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE)
        |    / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
        |       * CAST(m + 2 AS DOUBLE)), 6) AS var_hat
        |FROM red""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
