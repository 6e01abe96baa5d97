package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Interrupted time-series analysis (segmented regression) — the
  * quasi-experimental design used when there IS no control arm (a
  * policy/price change hits everyone at once): fit the daily series
  * separately before and after the breakpoint and report the LEVEL
  * change (post intercept minus the pre-trend's counterfactual
  * projection at the break) and the SLOPE change. Both fits are the
  * a29/w28 exact-BIGINT normal equations over the calendar-bounded
  * day spine; the breakpoint is the spine's midpoint (same integer
  * `div` midpoint discipline as a94).
  *
  * Shape: ONE fact agg to the day spine, one 10-moment conditional
  * reduce (both segments in one pass), 1-row arithmetic. One scan at
  * any scale.
  */
object InterruptedTs {

  private def seg(p: String): Seq[String] = Seq(
    s"(CAST(n$p AS DOUBLE) * CAST(sxy$p AS DOUBLE) - CAST(sx$p AS DOUBLE) * CAST(sy$p AS DOUBLE)) " +
      s"/ (CAST(n$p AS DOUBLE) * CAST(sxx$p AS DOUBLE) - CAST(sx$p AS DOUBLE) * CAST(sx$p AS DOUBLE)) AS b$p",
    s"(CAST(sy$p AS DOUBLE) - b$p * CAST(sx$p AS DOUBLE)) / CAST(n$p AS DOUBLE) AS a$p",
  )

  private val q = Q(
    "w34_interrupted_time_series",
    (s, d) => {
      val daily = Tables(s, d).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("y"))
        .select(col("day"), col("y"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy("day")).cast("long").as("t"))
        .localCheckpoint(false)
      val nDays = daily.agg(count(lit(1)).as("nn"))
      val flagged = daily.crossJoin(broadcast(nDays))
        .withColumn("brk", expr("nn div 2"))
        .withColumn("post", col("t") > col("brk"))
      def moments(post: Boolean, p: String) = Seq(
        sum(when(col("post") === post, 1L).otherwise(0L)).as(s"n$p"),
        sum(when(col("post") === post, col("t")).otherwise(0L))
          .as(s"sx$p"),
        sum(when(col("post") === post, col("y")).otherwise(0L))
          .as(s"sy$p"),
        sum(when(col("post") === post, col("t") * col("y")).otherwise(0L))
          .as(s"sxy$p"),
        sum(when(col("post") === post, col("t") * col("t")).otherwise(0L))
          .as(s"sxx$p"))
      val red = flagged.agg(max(col("brk")).as("brk"),
        (moments(false, "0") ++ moments(true, "1")): _*)
        .withColumn("b0", expr(seg("0").head.stripSuffix(" AS b0")))
        .withColumn("a0", expr(seg("0")(1).stripSuffix(" AS a0")))
        .withColumn("b1", expr(seg("1").head.stripSuffix(" AS b1")))
        .withColumn("a1", expr(seg("1")(1).stripSuffix(" AS a1")))
      red.selectExpr("brk AS breakpoint_t",
        "round(b0, 6) AS slope_pre", "round(b1, 6) AS slope_post",
        "round(b1 - b0, 6) AS slope_change",
        "round((a1 + b1 * CAST(brk + 1 AS DOUBLE)) " +
          "- (a0 + b0 * CAST(brk + 1 AS DOUBLE)), 6) AS level_change")
    },
    Some(
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
         |  FROM orders GROUP BY 1),
         |idx AS (
         |  SELECT day, y,
         |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
         |  FROM daily),
         |nn AS (SELECT count(*) AS nn FROM idx),
         |flagged AS (
         |  SELECT t, y, nn // 2 AS brk, t > nn // 2 AS post
         |  FROM idx CROSS JOIN nn),
         |red AS (
         |  SELECT max(brk) AS brk,
         |    CAST(sum(CASE WHEN NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN NOT post THEN t ELSE 0 END) AS BIGINT) AS sx0,
         |    CAST(sum(CASE WHEN NOT post THEN y ELSE 0 END) AS BIGINT) AS sy0,
         |    CAST(sum(CASE WHEN NOT post THEN t * y ELSE 0 END) AS BIGINT) AS sxy0,
         |    CAST(sum(CASE WHEN NOT post THEN t * t ELSE 0 END) AS BIGINT) AS sxx0,
         |    CAST(sum(CASE WHEN post THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN post THEN t ELSE 0 END) AS BIGINT) AS sx1,
         |    CAST(sum(CASE WHEN post THEN y ELSE 0 END) AS BIGINT) AS sy1,
         |    CAST(sum(CASE WHEN post THEN t * y ELSE 0 END) AS BIGINT) AS sxy1,
         |    CAST(sum(CASE WHEN post THEN t * t ELSE 0 END) AS BIGINT) AS sxx1
         |  FROM flagged),
         |fit AS (SELECT *, ${seg("0").head}, ${seg("1").head} FROM red),
         |fit2 AS (SELECT *, ${seg("0")(1)}, ${seg("1")(1)} FROM fit)
         |SELECT brk AS breakpoint_t,
         |  round(b0, 6) AS slope_pre, round(b1, 6) AS slope_post,
         |  round(b1 - b0, 6) AS slope_change,
         |  round((a1 + b1 * CAST(brk + 1 AS DOUBLE))
         |    - (a0 + b0 * CAST(brk + 1 AS DOUBLE)), 6) AS level_change
         |FROM fit2""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
