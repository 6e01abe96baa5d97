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
