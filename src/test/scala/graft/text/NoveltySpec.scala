package graft.text

import graft.SparkSpec

/** Novelty grades redundancy in ingestion order: the first doc is all
  * novel, a verbatim re-ingest contributes nothing, a half-copy sits
  * in between.
  */
class NoveltySpec extends SparkSpec {
  import spark.implicits._

  test("first occurrence owns the gram; copies score zero") {
    val dir = java.nio.file.Files.createTempDirectory("nov").toString
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val docs = Seq(
      (1L, base),
      (2L, base), // verbatim re-ingest → novelty 0
      (3L, s"$base juliet kilo lima"), // tail adds 3 new trigrams
      (4L, "mike november oscar papa quebec"), // all fresh
    ).map { case (id, t) => (id, t, "en", "test", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Novelty.novelty(graft.Tables(spark, dir).documents)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 1.0, "first doc fully novel")
    assert(got(2L) == 0.0, "verbatim copy fully redundant")
    assert(got(3L) > 0.0 && got(3L) < 0.5, s"half-copy graded: ${got(3L)}")
    assert(got(4L) == 1.0, "fresh text fully novel")
  }
}
