package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

class FeaturePrepSpec extends SparkSpec {
  import spark.implicits._

  private def ordersDir(rows: Seq[(Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("fp").toString
    rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("target encoding excludes the row's own fold") {
    // category A: fold 0 rows sum 10 (n=1), fold 1 rows sum 20 (n=1)
    val dir = ordersDir(Seq(
      (5L, "A", 10.0),   // 5 % 5 = fold 0
      (6L, "A", 20.0),   // fold 1
      (7L, "B", 99.0)))  // fold 2, alone in B
    val got = Registry.byName("a46_target_encoding").run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(("A", 0L)).contains(20.0)) // sees only fold 1
    assert(got(("A", 1L)).contains(10.0))
    assert(got(("B", 2L)).isEmpty)        // no out-of-fold evidence
  }

  test("lift table: a perfectly-ranking score lifts the top decile") {
    // 100 orders, scores 1..100; positives = top 10 scores exactly
    val rows = (1 to 100).map(i => (i.toLong,
      if (i > 90) "1-URGENT" else "3-MEDIUM", i.toDouble))
    val got = Registry.byName("a47_lift_table").run(spark, ordersDir(rows))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    val (n10, pos10, lift10) = got(10L)
    assert(n10 == 10L && pos10 == 10L)
    assert(lift10 == 10.0)  // top decile captures ALL positives
    // the full-population row has lift exactly 1
    assert(got(1L)._3 == 1.0)
  }

  test("surrogate ids equal the global dense rank, zero-based") {
    val dir = java.nio.file.Files.createTempDirectory("sk").toString
    // sparse, shuffled keys across multiple 1000-buckets
    val keys = Seq(5000L, 3L, 1500L, 7L, 2999L, 1000L)
    keys.map(Tuple1(_)).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Registry.byName("s31_surrogate_keys").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = keys.sorted.zipWithIndex
      .map { case (k, i) => k -> i.toLong }.toMap
    assert(got == want)
  }
}
