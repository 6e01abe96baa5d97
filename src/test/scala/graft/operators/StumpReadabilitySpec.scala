package graft.operators

import graft.{Registry, SparkSpec}

/** Stump split finder + readability on constructed tables. */
class StumpReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("a perfectly separable feature yields a zero-impurity split") {
    val dir = java.nio.file.Files.createTempDirectory("st").toString
    // scores 1..100; positives exactly the top half
    (1 to 100).map(i => (i.toLong,
        if (i > 50) "1-URGENT" else "3-MEDIUM", i.toDouble))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Registry.byName("a48_stump_split").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(got(5L) == 0.0)    // split at the median: both sides pure
    assert(got(1L) > 0.0)     // off-median splits are impure
    assert(got.values.min == 0.0)
  }

  test("flesch orders simple text above syllable-heavy text") {
    val dir = java.nio.file.Files.createTempDirectory("rd").toString
    Seq(
      (1L, "the cat sat on the mat. the dog ran."),
      (2L, "unequivocally extraordinary considerations necessitate reevaluation."))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.byName("t_readability").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (w1, s1, _, f1) = got(1L)
    assert(w1 == 9L && s1 == 2L)
    assert(f1 > got(2L)._4)
  }
}
