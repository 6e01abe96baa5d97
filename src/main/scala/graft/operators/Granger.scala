package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Granger causality — the lead/lag SIGNIFICANCE companion to w27's
  * CCF: does yesterday's series X improve today's prediction of
  * series Y beyond Y's own history? Order-1 test on the daily
  * order-count (y) and line-item shipment (x) spines, both
  * directions:
  *
  *   restricted    y_t = a + b·y_{t−1}
  *   unrestricted  y_t = a + b·y_{t−1} + c·x_{t−1}
  *   F = (RSS_r − RSS_u) / (RSS_u / (n − 3))
  *
  * EXACT construction (the a29/a71 normal-equations discipline): all
  * nine raw moments are BIGINT sums over the joined spine; centered
  * scaled moments M_ab = n·S_ab − S_a·S_b stay integral; the 2×2
  * Cramer solve and both RSS are then a fixed dag of IEEE ops on a
  * 1-row frame — deterministic in both engines.
  *
  * Shape: two fact scans collapse to calendar-bounded day spines;
  * the lag join and both direction aggregates run on |days| rows.
  */
object Granger {

  private val q = Q(
    "a78_granger_f",
    (s, d) => {
      val t = Tables(s, d)
      val spine = t.orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("y"))
        .join(t.lineitem
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(count(lit(1)).as("x")), "day")
      val lagged = spine.alias("t")
        .join(spine.alias("p"),
          col("p.day") === date_sub(col("t.day"), 1))
        .select(col("t.y").as("y"), col("t.x").as("x"),
          col("p.y").as("ylag"), col("p.x").as("xlag"))
        // both direction aggregates (and the union) reuse the lagged
        // spine — cut the lineage so the fact tables are scanned once
        .localCheckpoint(false)

      def direction(label: String, tgt: Column, own: Column,
          other: Column): DataFrame = {
        val m = lagged.agg(count(lit(1)).as("n"),
          sum(tgt).as("sy"), sum(tgt * tgt).as("syy"),
          sum(own).as("s1"), sum(own * own).as("s11"),
          sum(other).as("s2"), sum(other * other).as("s22"),
          sum(own * tgt).as("s1y"), sum(other * tgt).as("s2y"),
          sum(own * other).as("s12"))
        val nD = col("n").cast("double")
        def c(a: String) = col(a)
        val myy = (c("n") * c("syy") - c("sy") * c("sy")).cast("double")
        val m11 = (c("n") * c("s11") - c("s1") * c("s1")).cast("double")
        val m22 = (c("n") * c("s22") - c("s2") * c("s2")).cast("double")
        val m1y = (c("n") * c("s1y") - c("s1") * c("sy")).cast("double")
        val m2y = (c("n") * c("s2y") - c("s2") * c("sy")).cast("double")
        val m12 = (c("n") * c("s12") - c("s1") * c("s2")).cast("double")
        val det = m11 * m22 - m12 * m12
        val b1 = (m1y * m22 - m2y * m12) / det
        val b2 = (m2y * m11 - m1y * m12) / det
        val rssR = (myy - m1y * m1y / m11) / nD
        val rssU = (myy - b1 * m1y - b2 * m2y) / nD
        m.select(lit(label).as("direction"), col("n"),
          round(b2, 6).as("x_coef"),
          round((rssR - rssU) / (rssU / (nD - 3.0)), 6).as("f_stat"))
      }

      direction("x_to_y", col("y"), col("ylag"), col("xlag"))
        .unionAll(
          direction("y_to_x", col("x"), col("xlag"), col("ylag")))
        .orderBy("direction")
    },
    Some {
      def dir(label: String, tgt: String, own: String, other: String) =
        s"""SELECT '$label' AS direction, n,
           |  round(b2, 6) AS x_coef,
           |  round((rss_r - rss_u)
           |    / (rss_u / (CAST(n AS DOUBLE) - 3.0)), 6) AS f_stat
           |FROM (
           |  SELECT n, rss_r, b1, b2,
           |    (myy - b1 * m1y - b2 * m2y) / CAST(n AS DOUBLE) AS rss_u
           |  FROM (
           |    SELECT n, myy, m1y, m2y,
           |      (myy - m1y * m1y / m11) / CAST(n AS DOUBLE) AS rss_r,
           |      (m1y * m22 - m2y * m12)
           |        / (m11 * m22 - m12 * m12) AS b1,
           |      (m2y * m11 - m1y * m12)
           |        / (m11 * m22 - m12 * m12) AS b2
           |    FROM (
           |      SELECT n,
           |        CAST(n*syy - sy*sy AS DOUBLE) AS myy,
           |        CAST(n*s11 - s1*s1 AS DOUBLE) AS m11,
           |        CAST(n*s22 - s2*s2 AS DOUBLE) AS m22,
           |        CAST(n*s1y - s1*sy AS DOUBLE) AS m1y,
           |        CAST(n*s2y - s2*sy AS DOUBLE) AS m2y,
           |        CAST(n*s12 - s1*s2 AS DOUBLE) AS m12
           |      FROM (
           |        SELECT count(*) AS n,
           |          CAST(sum($tgt) AS BIGINT) AS sy,
           |          CAST(sum($tgt*$tgt) AS BIGINT) AS syy,
           |          CAST(sum($own) AS BIGINT) AS s1,
           |          CAST(sum($own*$own) AS BIGINT) AS s11,
           |          CAST(sum($other) AS BIGINT) AS s2,
           |          CAST(sum($other*$other) AS BIGINT) AS s22,
           |          CAST(sum($own*$tgt) AS BIGINT) AS s1y,
           |          CAST(sum($other*$tgt) AS BIGINT) AS s2y,
           |          CAST(sum($own*$other) AS BIGINT) AS s12
           |        FROM lagged) raw) mm) bb) rr"""
          .stripMargin
      s"""WITH yd AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
         |  FROM orders GROUP BY 1),
         |xd AS (
         |  SELECT CAST(l_shipdate AS DATE) AS day, count(*) AS x
         |  FROM lineitem GROUP BY 1),
         |spine AS (
         |  SELECT yd.day, y, x FROM yd JOIN xd ON yd.day = xd.day),
         |lagged AS (
         |  SELECT t.y AS y, t.x AS x, p.y AS ylag, p.x AS xlag
         |  FROM spine t JOIN spine p ON p.day = t.day - 1)
         |${dir("x_to_y", "y", "ylag", "xlag")}
         |UNION ALL
         |${dir("y_to_x", "x", "xlag", "ylag")}
         |ORDER BY direction""".stripMargin
    },
  )

  def all: Seq[Q] = Seq(q)
}
