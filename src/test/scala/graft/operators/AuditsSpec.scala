package graft.operators

import graft.SparkSpec

/** Contract-audit semantics pinned on a table with one violation of
  * each class.
  */
class AuditsSpec extends SparkSpec {
  import spark.implicits._

  private def dir(orders: Seq[(java.lang.Long, java.lang.Long, String,
      Double)], customers: Seq[Long]): String = {
    val d = java.nio.file.Files.createTempDirectory("audit").toString
    orders.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    customers.map(id => (id, s"c$id")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    d
  }

  test("each constraint counts its own violations; ok iff zero") {
    val orders = Seq[(java.lang.Long, java.lang.Long, String, Double)](
      (1L, 10L, "O", 100.0),          // clean
      (2L, null, "O", 100.0),         // null custkey
      (3L, 10L, "O", 350000.0),       // range
      (3L, 10L, "F", 100.0),          // duplicate orderkey
      (4L, 10L, "P", 100.0),          // bad status
      (5L, 99L, "O", 100.0),          // dangling reference
    )
    val got = graft.Registry.byName("a37_expectation_audit")
      .run(spark, dir(orders, Seq(10L)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3)))
      .toMap
    assert(got("not_null:o_custkey") == ((1L, false)))
    assert(got("unique:o_orderkey") == ((1L, false)))
    assert(got("range:o_totalprice[0,300000)") == ((1L, false)))
    assert(got("accepted:o_orderstatus{O,F}") == ((1L, false)))
    // the null-custkey row also fails the anti join → 2 dangling
    assert(got("referential:o_custkey->customer") == ((2L, false)))
    assert(got.values.forall(_._1 >= 0))
  }

  test("quarantine routes on the FIRST failing rule") {
    val orders = Seq[(java.lang.Long, java.lang.Long, String, Double)](
      (1L, 10L, "O", 100.0),
      (2L, null, "P", 350000.0), // fails all three → not_null wins
      (3L, 10L, "P", 350000.0),  // range beats accepted
      (4L, 10L, "P", 100.0),     // accepted only
    )
    val got = graft.Registry.byName("s24_quarantine_split")
      .run(spark, dir(orders, Seq(10L)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      2L -> "not_null:o_custkey",
      3L -> "range:o_totalprice[0,300000)",
      4L -> "accepted:o_orderstatus{O,F}"))
  }

  test("benford: exact ppm shares and deviations on a crafted mix") {
    // 30 prices leading with 1, 10 leading with 2 → 750000 / 250000 ppm
    val orders: Seq[(java.lang.Long, java.lang.Long, String, Double)] =
      (1 to 30).map(i => (i.toLong: java.lang.Long,
        1L: java.lang.Long, "O", 1.23)) ++
        (31 to 40).map(i => (i.toLong: java.lang.Long,
          1L: java.lang.Long, "O", 2.51))
    val got = graft.Registry.byName("a38_benford_audit")
      .run(spark, dir(orders, Seq(1L)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(got("1") == ((30L, 750000L, 750000L - 301030L)))
    assert(got("2") == ((10L, 250000L, 250000L - 176091L)))
  }
}
