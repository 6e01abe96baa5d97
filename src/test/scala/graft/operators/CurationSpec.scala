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

  test("domain mixture: budgets respected per domain, admission is prefix-closed") {
    val rows = graft.Registry.byName("t_domain_mixture")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(1))
    byLang.values.foreach { rs =>
      val cums = rs.map(_.getLong(3)).sorted
      assert(cums.last <= 2000, "running token total stays within budget")
      // each admitted doc's cum = previous cum + its own n_tok (prefix of
      // the hash-ordered sequence, no gaps)
      val sorted = rs.sortBy(_.getLong(3))
      sorted.foldLeft(0L) { (prev, r) =>
        assert(r.getLong(3) == prev + r.getInt(2)); r.getLong(3)
      }
    }
  }

  test("cross-doc dup fraction: bounded, keep-rule consistent, full cover") {
    val d = sf("sf0.001")
    val rows = graft.Registry.byName("t_crossdoc_ngram_dup")
      .run(spark, d).collect()
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(rows.length == nDocs, "one verdict per document")
    rows.foreach { r =>
      val frac = r.getDouble(2)
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getBoolean(3) == (frac <= 0.3))
    }
    // the synthetic corpus shares heavy boilerplate — some doc must
    // actually trip the cut, or the filter tests nothing
    assert(rows.exists(!_.getBoolean(3)))
  }
}
