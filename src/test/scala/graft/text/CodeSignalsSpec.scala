package graft.text

import graft.{Registry, SparkSpec}

class CodeSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(texts: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cs").toString
    texts.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("code reads as codey, prose does not") {
    val code =
      "def f(x):\n  return g(x);\n  if x:\n    import os\n" +
        "class A:\n  var y = {1};\nconst z = [2];"
    val prose = "the quick brown fox jumps over the lazy dog " * 5
    val dir = docsDir(Seq((1L, code), (2L, prose)))
    val got = Registry.byName("t_code_signals").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    assert(got(1L))
    assert(!got(2L))
  }

  test("url domains: extracted, lowercased, counted; footer attached") {
    val dir = java.nio.file.Files.createTempDirectory("ud").toString
    Seq(
      (1L, "see https://Example.COM/page and http://a.b.org/x", "s1"),
      (2L, "again https://example.com/other", "s2"),
      (7L, "plain text", "s1"))  // % 7 == 0: gets the mirror link too
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.byName("t_url_domains").run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "example.com" -> 2L, "a.b.org" -> 1L,
      "s1.example.org" -> 2L, "s2.example.org" -> 1L,
      "mirror-1.archive.net" -> 1L))
  }
}

class KsTestSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions give D = 0; disjoint give D = 1") {
    def run(rows: Seq[(Long, String, Double)]): Double = {
      val dir = java.nio.file.Files.createTempDirectory("ks").toString
      rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      Registry.byName("a49_ks_test").run(spark, dir).head().getDouble(3)
    }
    val same = (1 to 20).flatMap(i => Seq(
      (i.toLong * 2, "1-URGENT", i.toDouble),
      (i.toLong * 2 + 1, "5-LOW", i.toDouble)))
    assert(run(same) == 0.0)
    val disjoint = (1 to 20).map(i =>
      (i.toLong, "1-URGENT", i.toDouble)) ++
      (1 to 20).map(i => (100L + i, "5-LOW", 1000.0 + i))
    assert(run(disjoint) == 1.0)
  }
}
