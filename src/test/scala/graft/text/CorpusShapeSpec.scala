package graft.text

import graft.SparkSpec

/** Gini and Zipf diagnostics on corpora with known shape. */
class CorpusShapeSpec extends SparkSpec {
  import spark.implicits._

  private def dir(rows: Seq[(Long, String, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("shape").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("gini: exact ppm for skewed and uniform source mixes") {
    // counts (1, 3): G = (2·(1·1+2·3) − 3·4) / (2·4) = 0.25
    val skewed = dir(Seq((1L, "a", "A"), (2L, "a", "B"), (3L, "a", "B"),
      (4L, "a", "B")))
    val g1 = graft.Registry.byName("t_source_gini").run(spark, skewed)
      .collect().head
    assert((g1.getLong(0), g1.getLong(1), g1.getLong(2)) == ((2L, 4L, 250000L)))
    // equal counts → 0
    val flat = dir(Seq((1L, "a", "A"), (2L, "a", "A"), (3L, "a", "B"),
      (4L, "a", "B")))
    assert(graft.Registry.byName("t_source_gini").run(spark, flat)
      .collect().head.getLong(2) == 0L)
  }

  test("char entropy: exact bits for degenerate and uniform alphabets") {
    val d = dir(Seq(
      (1L, "aaaa", "A"),   // one symbol → 0 bits
      (2L, "abab", "A"),   // two equiprobable → 1 bit
      (3L, "abcd", "A"))) // four equiprobable → 2 bits
    val got = graft.Registry.byName("t_char_entropy").run(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0), s"got $got")
  }

  test("zipf: a constructed 1/r vocabulary fits slope ≈ −1") {
    // token w_r appears max(60/r, 1) times: frequencies follow 1/rank
    val words = (1 to 30).flatMap(r =>
      Seq.fill(math.max(60 / r, 1))(s"word$r"))
    val text = words.mkString(" ")
    val got = graft.Registry.byName("t_zipf_slope")
      .run(spark, dir(Seq((1L, text, "A")))).collect().head
    assert(got.getLong(0) == 30L)
    val slope = got.getDouble(1)
    assert(slope < -0.8 && slope > -1.2, s"slope $slope")
  }
}
