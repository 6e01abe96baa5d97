package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted median — the robust-aggregation gap between the exact
  * unweighted percentiles (`a4`) and the MAD fences (`a30`): "the
  * price at which half the QUANTITY sits below" (order-size-weighted
  * typical price), the estimator to reach for when rows represent
  * different volumes — reference anchor: the salary quantiles at
  * `flows/aggregate/common.py:235-248` are the unweighted special case.
  *
  * Exact-integer discipline: prices go to cents BIGINTs
  * (`round(x*100)`, the Bootstrap/Linkage convention), weights are
  * integral quantities — so the running weight sum, the 2·rw ≥ tw
  * threshold and the chosen value are all engine-exact. Ties on the
  * value are safe by construction: the crossing row lands inside a tie
  * block, `min(value)` over satisfying rows returns the block's value
  * regardless of intra-tie accumulation order.
  *
  * Scale shape: one group-keyed window (running weight) + one
  * group-keyed agg join — the same two-exchange shape as `a6`; groups
  * are processed independently so the sort is per-partition, never
  * global.
  */
object WeightedMedian {

  private val q = Q(
    "a39_weighted_median",
    (s, d) => {
      val li = Tables(s, d).lineitem.select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        col("l_quantity").cast("long").as("w"))
      val tot = li.groupBy("l_returnflag").agg(sum(col("w")).as("tw"))
      val win = Window.partitionBy("l_returnflag").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.withColumn("rw", sum(col("w")).over(win))
        .join(tot, "l_returnflag")
        .filter(col("rw") * 2 >= col("tw"))
        .groupBy("l_returnflag")
        .agg(min(col("cents")).as("w_median_cents"))
    },
    Some(
      """WITH tot AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS tw
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag
        |      ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS rw
        |  FROM lineitem)
        |SELECT c.l_returnflag,
        |  min(cents) AS w_median_cents
        |FROM c JOIN tot USING (l_returnflag)
        |WHERE rw * 2 >= tot.tw
        |GROUP BY 1""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
