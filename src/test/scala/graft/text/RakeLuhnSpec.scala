package graft.text

import graft.{Registry, SparkSpec}

class RakeLuhnSpec extends SparkSpec {
  import spark.implicits._

  test("rake: degree/frequency scoring ranks rich phrases first") {
    val dir = java.nio.file.Files.createTempDirectory("rk").toString
    // runs: "deep network" ×1, "deep network graph" ×1, "fast cat" ×1
    // deg: deep=5 network=5 graph=3 fast=2 cat=2; freq: 2,2,1,1,1
    // scores: dng = 2.5+2.5+3 = 8; dn = 5; fc = 4
    Seq((1L, "a deep network and a deep network graph and a fast cat"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.byName("t_rake_keyphrases").run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("deep network graph" -> 8.0,
      "deep network" -> 5.0, "fast cat" -> 4.0))
  }

  test("luhn: even keys validate, odd keys fail, masking holds") {
    val dir = java.nio.file.Files.createTempDirectory("lh").toString
    (1L to 20L).map(Tuple1(_)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = Registry.byName("f18_luhn_check").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got.forall { case (k, m, v) => v == (k % 2 == 0) })
    assert(got.forall(_._2.matches("\\*{12}\\d{4}")))
  }
}
