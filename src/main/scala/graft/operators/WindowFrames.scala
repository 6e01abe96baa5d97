package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-frame semantics the existing window rows don't exercise:
  * value-based RANGE frames (every row with the same order value
  * shares one frame — ROWS would split ties arbitrarily) and the rank
  * function family with its exact rational definitions.
  */
object WindowFrames {

  /** Trailing 30-day spend per customer via a RANGE frame over epoch
    * days: the frame is "all orders within 30 VALUE units", which a
    * ROWS frame cannot express when order dates repeat — same-day
    * orders must see identical totals. One customer-keyed shuffle;
    * per-partition sort; money decimal-exact.
    */
  private val rangeFrame = Q(
    "w25_range_frame_sum",
    (s, d) => {
      val o = Tables(s, d).orders.select(
        col("o_custkey"), col("o_orderkey"),
        expr("datediff(o_orderdate, DATE '1970-01-01')").cast("long")
          .as("day"),
        col("o_totalprice")
          .cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(12, 2)).as("spend"))
      val w = Window.partitionBy("o_custkey").orderBy("day")
        .rangeBetween(-30, 0)
      o.withColumn("trailing_30d_spend",
          sum(col("spend")).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("day"),
          col("trailing_30d_spend"))
    },
    Some(
      """SELECT o_custkey, o_orderkey,
        |  CAST(datediff('day', DATE '1970-01-01', o_orderdate)
        |    AS BIGINT) AS day,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS trailing_30d_spend
        |FROM orders""".stripMargin),
  )

  /** The rank-function family over one window, each with its exact
    * contract: row_number (arbitrary within ties — made deterministic
    * by a full orderBy), rank (gaps), dense_rank (no gaps),
    * percent_rank ((rank−1)/(n−1)) and cume_dist (peers-inclusive
    * c/n) — the two rationals emitted at 6 dp from exact counts.
    */
  private val rankFamily = Q(
    "w26_rank_functions",
    (s, d) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val wq = Window.partitionBy("l_returnflag").orderBy(col("l_quantity"))
      Tables(s, d).lineitem
        .select(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"))
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(wq))
        .withColumn("drk", dense_rank().over(wq))
        .withColumn("prk", round(percent_rank().over(wq), 6))
        .withColumn("cd", round(cume_dist().over(wq), 6))
    },
    Some(
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  CAST(row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity, l_orderkey, l_linenumber) AS INT) AS rn,
        |  CAST(rank() OVER w AS INT) AS rk,
        |  CAST(dense_rank() OVER w AS INT) AS drk,
        |  round(percent_rank() OVER w, 6) AS prk,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)"""
        .stripMargin),
  )

  def all: Seq[Q] = Seq(rangeFrame, rankFamily)
}
