package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The count-table order statistic must replicate the buffering
  * percentile UDAF bit-for-bit — it replaces it in a40's fences.
  */
class OrderStatsSpec extends SparkSpec {
  import spark.implicits._

  test("matches the built-in percentile on grouped doubles with ties") {
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 1 to 97
    } yield (g, ((i * 7919 + g.hashCode.abs) % 50).toDouble / 3.0)
    val df = rows.toDF("k", "v")
    val builtin = df.groupBy("k")
      .agg(percentile(col("v"), lit(0.05)).as("p05"),
        percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.95)).as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ours = OrderStats.percentilesByGroup(df, "k", "v",
        Seq("p05" -> 0.05, "p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(ours == builtin)  // exact equality, not tolerance
  }

  test("single-value groups and exact-rank hits stay exact") {
    val df = Seq(("x", 5.0), ("y", 1.0), ("y", 2.0), ("y", 3.0))
      .toDF("k", "v")
    val got = OrderStats.percentilesByGroup(df, "k", "v",
        Seq("p50" -> 0.5)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("x" -> 5.0, "y" -> 2.0))
  }
}
