package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("incrementalDedup equals the exact anti-join (no false negatives)") {
    import spark.implicits._
    val seen = (1 to 500).map(i => s"key$i").toDF("k")
    // batch: 100 already-seen keys + 150 new ones
    val batch = ((401 to 500) ++ (1001 to 1150)).map(i => s"key$i").toDF("k")
    val got = Curation.incrementalDedup(batch, seen, "k",
        expected = 1000L, fpp = 0.05)
      .collect().map(_.getString(0)).toSet
    val want = batch.join(seen, Seq("k"), "left_anti")
      .collect().map(_.getString(0)).toSet
    assert(got == want)
    assert(got.size == 150 && got.forall(_.drop(3).toInt >= 1001))
  }

  test("null keys in the batch survive (they are never 'seen')") {
    import spark.implicits._
    val seen = Seq("a").toDF("k")
    val batch = Seq(Some("a"), Some("b"), None).toDF("k")
    val got = Curation.incrementalDedup(batch, seen, "k", expected = 10L)
      .collect().map(r => Option(r.getString(0))).toSet
    assert(got == Set(Some("b"), None))
  }
}
