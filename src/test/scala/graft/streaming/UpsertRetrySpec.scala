package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The CDC sink's effectively-exactly-once claim (s22): a RETRIED
  * micro-batch — same batch id, same input, re-applied against the same
  * current version — must produce a byte-identical next version, so a
  * foreachBatch crash between write and pointer swap is safe to replay.
  * This holds because the merge is deterministic and the version write
  * is mode=overwrite keyed on the batch id; the spec pins the contract
  * by literally running the batch body twice.
  */
class UpsertRetrySpec extends SparkSpec {

  test("re-applying the same batch yields an identical next version") {
    import spark.implicits._
    val target = java.nio.file.Files.createTempDirectory("graft_retry")
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    base.write.parquet(target.resolve("v0").toString)
    val batch = Seq[(Long, Option[String], Option[Double], Boolean)](
      (2L, Some("b2"), Some(25.0), false), // update
      (3L, None, None, true),              // delete
      (9L, Some("i"), Some(1.0), false)    // insert
    ).toDF("k", "name", "bal", "is_delete")
      .select(col("k"), col("name"), col("bal").cast("double"),
        col("is_delete"))

    def applyBatch(): Unit = {
      val merged = graft.operators.SourcesSinks.upsertMerge(
        spark.read.parquet(target.resolve("v0").toString), batch,
        "k", "is_delete")
      merged.write.mode("overwrite")
        .parquet(target.resolve("v1").toString)
    }
    applyBatch()
    val first = spark.read.parquet(target.resolve("v1").toString)
      .collect().map(_.toSeq).toSet
    applyBatch() // the retry
    val second = spark.read.parquet(target.resolve("v1").toString)
      .collect().map(_.toSeq).toSet
    assert(first === second)
    assert(second === Set(
      Seq(1L, "a", 10.0), Seq(2L, "b2", 25.0), Seq(9L, "i", 1.0)))
  }
}
