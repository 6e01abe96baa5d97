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

  test("chunking covers every token exactly once at stride == chunk") {
    val d = sf("sf0.001")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val out = graft.Registry.byName("t_chunk_documents")
      .run(spark, d).collect()
    // stride 24 < chunk 32 ⇒ overlap: total chunk tokens ≥ corpus tokens,
    // and every chunk is non-empty with ≤ 32 tokens
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Int]("n_tok")
      assert(n >= 1 && n <= 32, s"n_tok=$n")
      assert(r.getAs[String]("chunk").split(" ", -1).length == n)
    }
  }

  test("chunk dedup: identical docs collapse to one copy of each chunk") {
    import spark.implicits._
    val q = graft.Registry.byName("t_chunk_dedup_reassemble")
    // two identical long docs + one unique: the duplicate's chunks must
    // all be dropped, the first doc and the unique one survive intact
    val text = (1 to 80).map(i => s"w$i").mkString(" ")
    val df = Seq((0L, text), (1L, text), (2L, "only here once"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("chunkdedup").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = q.run(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(0L)._1 == text, "first occurrence keeps every chunk")
    assert(!out.contains(1L), "full duplicate vanishes")
    assert(out(2L)._1 == "only here once")
  }

  test("dsir weights rank the target language highest and are partition-stable") {
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(dir + "/documents.parquet")
    val w = graft.Registry.byName("t_dsir_weights").run(spark, dir)
    val byLang = w.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(avg(col("dsir_weight") / col("n_tok")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byLang("en") == byLang.values.max,
      s"en must score highest: $byLang")
    // order-independence: the decimal-stable sum makes the weight exact,
    // so any partitioning yields byte-identical rows
    val a = w.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = w.repartition(13).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("perplexity buckets are exact rank terciles ordered by fluency") {
    import spark.implicits._
    // 6 docs: three of corpus-dominant tokens, three of near-unique ones
    val docs = Seq(
      (0L, "the the the the the the"),
      (1L, "the the the the of of"),
      (2L, "the of the of the of"),
      (3L, "rare1 rare2 the of the of"),
      (4L, "rare3 rare4 rare5 rare6 the of"),
      (5L, "zz1 zz2 zz3 zz4 zz5 zz6"))
    val tmp = java.nio.file.Files.createTempDirectory("ppl").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.Registry.byName("t_perplexity_buckets").run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    val byBucket = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket.values.forall(_.length == 2), s"terciles of 6: $got")
    assert(byBucket("head").min >= byBucket("middle").max)
    assert(byBucket("middle").min >= byBucket("tail").max)
    // all-common docs lead, the all-unique doc trails
    val bucketOf = got.map(t => t._1 -> t._3).toMap
    assert(bucketOf(0L) == "head" && bucketOf(5L) == "tail")
  }

  test("dedup spans: first occurrence survives, repeats excised, short docs untouched") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (0L, span + " unique0 tail0"),          // first occurrence: intact
      (1L, "lead1 " + span + " tail1"),       // repeat inside: span excised
      (2L, span),                              // pure boilerplate: empties
      (3L, "short doc only"),                  // < SpanL tokens: untouched
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"))      // unique 9-gram: untouched
    val tmp = java.nio.file.Files.createTempDirectory("spans").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.Registry.byName("t_dedup_spans").run(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(0L)._1 == span + " unique0 tail0")
    assert(got(1L)._1 == "lead1 tail1", s"got ${got(1L)}")
    assert(got(2L) == ("", 0L))
    assert(got(3L)._1 == "short doc only")
    assert(got(4L)._2 == 9L)
  }
}
