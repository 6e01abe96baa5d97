package graft.text

import graft.{Registry, SparkSpec}

class SoundexSpec extends SparkSpec {
  import spark.implicits._

  test("the canonical soundex examples, h/w transparency included") {
    val dir = java.nio.file.Files.createTempDirectory("sx").toString
    Seq("robert", "rupert", "ashcraft", "tymczak", "pfister", "honeyman")
      .map(w => Tuple2(1L, w)).toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Registry.byName("f19_soundex_blocking").run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("robert") == "R163")
    assert(got("rupert") == "R163")    // phonetic block with robert
    assert(got("ashcraft") == "A261")  // s,c separated only by h: merge
    assert(got("tymczak") == "T522")   // vowel separates c,z? no: y does
    assert(got("pfister") == "P236")   // NARA: first letter's code dedups f
    assert(got("honeyman") == "H555")
  }
}
