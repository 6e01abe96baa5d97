package graft.operators

import graft.SparkSpec

/** Entity formation: linked records merge into one entity with
  * survivorship-resolved attributes; unlinked records form no entity.
  */
class GoldenRecordsSpec extends SparkSpec {
  import spark.implicits._

  test("linked records merge; canonical attributes are modal") {
    val dir = java.nio.file.Files.createTempDirectory("er").toString
    // all in one nation block, chk = id % 10 = 0, same balance band:
    // {10,20,30} share segment A → one entity of 3; {40,50} share B →
    // one entity of 2; 60 (segment C) links to no one
    val rows = Seq(
      (10L, "A"), (20L, "A"), (30L, "A"),
      (40L, "B"), (50L, "B"),
      (60L, "C"),
    ).map { case (id, seg) =>
      (id, s"cust$id", "addr", 7L, "phone", 500.0, seg, "comment")
    }
    rows.toDF("c_custkey", "c_name", "c_address", "c_nationkey",
      "c_phone", "c_acctbal", "c_mktsegment", "c_comment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val got = graft.Registry.byName("j18_entity_golden_records")
      .run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((10L, 3L, "A"), (40L, 2L, "B")),
      s"got ${got.toSeq}")
  }
}
