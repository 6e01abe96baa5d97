package graft.operators

import graft.SparkSpec

/** CDC classes on a hand fixture, including the null-safe comparison
  * (NULL → value counts as changed, NULL = NULL does not).
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("added / removed / changed / unchanged classify correctly") {
    val v1 = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("d"))).toDF("k", "v")
    val v2 = Seq((1L, Some("a")), (2L, Some("B")), (3L, None),
      (5L, Some("e"))).toDF("k", "v")
    val got = SourcesSinks.snapshotDiff(v1, v2, "k", Seq("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 4L -> "removed", 5L -> "added"))
  }

  test("null to value is a change") {
    val v1 = Seq((1L, Option.empty[String])).toDF("k", "v")
    val v2 = Seq((1L, Some("x"))).toDF("k", "v")
    val got = SourcesSinks.snapshotDiff(v1, v2, "k", Seq("v")).collect()
    assert(got.length == 1 && got.head.getString(1) == "changed")
  }
}

/** Incremental aggregate maintenance ≡ full recompute, any cutoff. */
class IncrementalAggSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("merged agg equals full recompute bit-for-bit") {
    val dir = sf("sf0.001")
    val got = graft.Registry.byName("s18_incremental_agg_maintenance")
      .run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = graft.Tables(spark, dir).orders
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        graft.util.Stable.dsum(col("o_totalprice")).as("sum_total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want)
  }
}
