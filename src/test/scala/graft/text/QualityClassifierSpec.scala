package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Feature extraction and scoring invariants of the hashed linear
  * classifier (the oracle pins cross-engine exactness; this pins the
  * semantics the hash obscures).
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) = {
    val q = graft.Registry.all.find(_.name == "t_quality_classifier").get
    val dir = java.nio.file.Files.createTempDirectory("qc").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    q.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("feature count is 2n-1 and identical text scores identically") {
    val got = run(Seq(1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "alpha"))
    assert(got(1L)._1 == 5, "3 unigrams + 2 bigrams")
    assert(got(3L)._1 == 1, "single token has no bigram")
    assert(got(1L) == got(2L), "deterministic: same text, same score")
  }

  test("bigrams make the score order-sensitive") {
    val got = run(Seq(1L -> "alpha beta", 2L -> "beta alpha"))
    // same unigrams, different bigram feature — scores differ unless the
    // two bigram hashes collide in the 2048-bucket weight space
    assert(got(1L)._2 != got(2L)._2)
  }
}
