package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins (SURVEY "partitioning & shuffle"): two
  * tables bucketed on the join key join with NO shuffle exchange — the
  * storage-level answer to repeated big-big joins at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without an Exchange") {
    // warehouse dir is a static conf — use the default (gitignored) one,
    // clearing any stale table locations from a previous JVM
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.sources.bucketing.enabled", "true")
    for (t <- Seq("orders_b", "lineitem_b")) {
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }

    val orders = s.read.parquet(sf("sf0.001") + "/orders.parquet")
    val lineitem = s.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("lineitem_b")

    val joined = s.table("lineitem_b")
      .join(s.table("orders_b"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"plan should be co-located:\n$plan")

    // and it computes the same result as the plain join
    val expect = lineitem.join(orders,
      lineitem("l_orderkey") === orders("o_orderkey")).count()
    assert(joined.count() == expect)
  }

  test("registered s20: the join subtree adds no exchange of its own") {
    // disable broadcast so the co-location claim is what the plan shows
    // (at real scale neither fact side broadcasts anyway)
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val df = graft.Registry.byName("s20_bucketed_colocated_join")
      .run(s, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // exactly ONE exchange: the per-customer aggregation above the join
    assert(exchanges == 1, s"want 1 exchange (agg only), got $exchanges:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(8).mkString("\n"))
    assert(df.count() > 0)
  }

  test("registered s21: an equality filter on the bucket key prunes to 1 bucket") {
    // autoBucketedScan turns bucketed reads OFF for scans with no
    // join/agg to feed — and bucket-filter pruning with them. Pin the
    // pruning with the heuristic disabled; results are identical either
    // way (the registered row's oracle covers the default path).
    val s = spark.newSession()
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val df = graft.Registry.byName("s21_bucket_pruned_scan")
      .run(s, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 16"),
      plan.linesIterator.take(8).mkString("\n"))
    assert(df.count() > 0)
  }
}
