package graft.text

import graft.SparkSpec

/** Planted-contamination recall: a verbatim copy of a benchmark doc
  * must score recall 1.0, a paraphrase-with-insertions must land in
  * (0, 1), and unrelated text must stay under the reporting floor.
  */
class RougeSpec extends SparkSpec {
  import spark.implicits._

  test("rouge-2 recall finds planted contamination at the right grade") {
    val dir = java.nio.file.Files.createTempDirectory("rouge").toString
    val bench = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      // doc_id 0 and 97 are benchmark members (BenchMod = 97)
      (0L, bench),
      (97L, "uniform unique tokens nothing shared here at all"),
      (5L, bench), // verbatim copy → recall 1.0 vs bench 0
      // shares exactly 3 of the 7 benchmark bigrams → recall 3/7
      (6L, "alpha bravo charlie delta plus some unrelated trailing words"),
      (7L, "completely different text with no overlapping bigrams"),
    ).map { case (id, t) =>
      (id, t, "en", "test", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Rouge.rouge2Pairs(graft.Tables(spark, dir).documents)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5)))
      .toMap
    assert(got((5L, 0L)) == 1.0, "verbatim copy scores full recall")
    val partial = got((6L, 0L))
    assert(math.abs(partial - 3.0 / 7.0) < 1e-3,
      s"half-copy grades between 0 and 1, got $partial")
    assert(!got.contains((7L, 0L)), "unrelated doc below the floor")
    assert(!got.keys.exists(_._2 == 97L), "clean benchmark doc unmatched")
  }
}
