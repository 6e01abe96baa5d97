package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom's defining contract: zero false negatives, bounded (and here
  * deterministic) false positives, density column consistent.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("every inserted key is a member; absences are near-certain misses") {
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    (1 to 40).map(i => (i.toLong, s"Supplier#$i"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    (1 to 200).map(i => (i.toLong, s"Customer#$i"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val q = graft.Registry.all.find(_.name == "a28_bloom_replayable").get
    val rows = q.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    val (present, absent) = rows.partition(_._2)
    assert(present.length == 40 && absent.length == 200)
    // no false negatives, ever: all 4 probe positions of an inserted key
    // are set by construction
    assert(present.forall(r => r._3 == 4L && r._4))
    // 40 keys × ≤4 bits in 2048 ⇒ fill ≤ 160/2048; expected FP rate
    // (fill)^4 ≈ 4e-5, so 200 absent probes should all miss
    assert(absent.count(_._4) == 0)
    val nBits = rows.head._5
    assert(nBits > 0 && nBits <= 160)
  }
}

/** Bloom semi-join reduction: the prefilter must be transparent in the
  * result, actually prune, and run as a map over the fact scan.
  */
class BloomSemiJoinSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("prefilter keeps every true match, prunes most non-matches") {
    val dir = sf("sf0.001")
    val t = graft.Tables(spark, dir)
    val dim = t.orders
      .filter(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 1995)
      .select(col("o_orderkey"))
    val fact = t.lineitem.select(col("l_orderkey"))
    val survivors = Bloom.bloomPrefilter(fact, "l_orderkey", dim, "o_orderkey")
    val nFact = fact.count()
    val nSurv = survivors.count()
    val nTrue = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .count()
    // no false negatives: every true-match row survives
    val lost = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .select("l_orderkey").except(survivors.select("l_orderkey"))
    assert(lost.count() == 0)
    // and the filter genuinely prunes (dim keys are a small fraction of
    // fact keys, so survivors must be far below the full fact)
    assert(nSurv >= nTrue && nSurv < nFact / 2,
      s"fact=$nFact survivors=$nSurv true=$nTrue")
  }

  test("registered query equals the plain unfiltered join") {
    val dir = sf("sf0.001")
    val t = graft.Tables(spark, dir)
    val got = graft.Registry.byName("j17_bloom_semijoin").run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = t.lineitem.join(t.orders,
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 1995)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("plan: inline bitmap probe, exact join is a hash join") {
    val p = graft.Registry.byName("j17_bloom_semijoin")
      .run(spark, sf("sf0.001")).queryExecution.executedPlan.toString()
    // the bloom words arrive as a broadcast ONE-ROW constant (the
    // repo-standard crossJoin shape — bounded by construction); the
    // probe itself must be an inline expression over the scan, and the
    // exactness-restoring equi join a real hash join
    assert(p.contains("element_at"), "bitmap probe must be inline")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
