package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The winnowing guarantee: documents sharing a run of ≥ k+W−1 tokens
  * share at least one fingerprint; disjoint documents share none (up to
  * hash collisions, absent on this fixture).
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    val dir = java.nio.file.Files.createTempDirectory("win").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = graft.Registry.all.find(_.name == "t_winnowing_fingerprints").get
    q.run(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.map(_.getLong(1)).toSet }
  }

  test("shared run of k+W-1 tokens yields a shared fingerprint") {
    // shared run of 6 tokens (= K + W - 1) embedded in different contexts
    val run = "s1 s2 s3 s4 s5 s6"
    val got = fps(Seq(
      1L -> s"a1 a2 a3 a4 $run b1 b2 b3 b4",
      2L -> s"c1 c2 c3 $run d1 d2 d3 d4 d5",
      3L -> "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"))
    assert((got(1L) & got(2L)).nonEmpty, "guaranteed shared fingerprint")
    assert((got(1L) & got(3L)).isEmpty && (got(2L) & got(3L)).isEmpty)
  }

  test("fingerprint set is sparse relative to the gram count") {
    val n = 200
    val text = (1 to n).map(i => s"w${i % 97}x$i").mkString(" ")
    val got = fps(Seq(1L -> text))
    val grams = n - 2
    // expectation is ~2/(W+1) of grams; allow generous slack
    assert(got(1L).size < grams / 2, s"${got(1L).size} of $grams grams")
    assert(got(1L).nonEmpty)
  }
}
