package graft.dedup

import graft.SparkSpec

/** MinHash-LSH and SimHash behaviour on a crafted corpus with planted
  * near-duplicates — the spec-side verification for the approximate
  * operators whose queries carry no SQL oracle.
  */
class MinHashSimHashSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat watches from the warm stone wall near the old barn " +
    "and the farmer counts sheep in the green field by the river bank"
  private val nearDup = base.replace("lazy dog", "sleepy dog") // 1-word edit
  private val unrelated = "completely different text about spark catalyst " +
    "optimizer rules partition pruning shuffle exchange broadcast hash " +
    "joins tungsten codegen vectorized parquet readers and column pruning"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, unrelated), (3L, base),
  ).toDF("doc_id", "text")

  test("minhash finds planted near-dup and exact-dup pairs, not unrelated") {
    val pairs = MinHashDedup.nearDupPairs(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((0L, 1L)), "near-dup pair found")
    assert(pairSet.contains((0L, 3L)), "exact-dup pair found")
    assert(!pairSet.exists(p => p._1 == 2L || p._2 == 2L), "no false pair")
    val exact = pairs.find(p => (p._1, p._2) == (0L, 3L)).get
    assert(exact._3 == 1.0, "identical docs have jaccard 1.0")
  }

  test("minhash signature is deterministic across runs") {
    val a = MinHashDedup.signatures(docs).select("doc_id", "m0", "m63")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = MinHashDedup.signatures(docs.repartition(3))
      .select("doc_id", "m0", "m63")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("simhash: identical docs hamming 0, near-dups close, unrelated far") {
    val fp = SimHashDedup.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(3L))
    val nearH = java.lang.Long.bitCount(fp(0L) ^ fp(1L))
    val farH = java.lang.Long.bitCount(fp(0L) ^ fp(2L))
    assert(nearH < farH, s"near=$nearH far=$farH")
    assert(nearH <= 10)
    assert(farH > 10)
  }

  test("simhash pair search returns exact dups at hamming 0") {
    val pairs = SimHashDedup.nearDupPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  // ---- hot-bucket hardening: a boilerplate-heavy corpus must not blow
  // up the candidate stage, and the output must be unchanged ----

  private def pathological = {
    // 200 exact copies (one degenerate bucket) + the planted docs above
    val copies = (100L until 300L).map(i => (i, base))
    (Seq((0L, base), (1L, nearDup), (2L, unrelated)) ++ copies)
      .toDF("doc_id", "text")
  }

  test("minhash: exact-copy floods keep the LSH candidate stage bounded") {
    val n = 201 // docs sharing `base` text
    // stage 0 collapses all copies to one exemplar: the candidate join
    // sees 3 distinct texts, so at most 3 candidate pairs
    val hmap = pathological.selectExpr("doc_id", "md5(text) AS h")
    val reps = pathological.join(
      hmap.groupBy("h").agg(org.apache.spark.sql.functions.min("doc_id")
        .as("doc_id")).select("doc_id"), Seq("doc_id"), "left_semi")
    val candN = MinHashDedup.candidatePairs(reps).count()
    assert(candN <= 3, s"candidates after pre-dedup: $candN")

    // un-hardened candidate volume on the same corpus would be O(n²)
    val naive = MinHashDedup.candidatePairs(pathological).count()
    assert(naive >= n.toLong * (n - 1) / 2, s"naive candidates: $naive")

    // output unchanged: every copy pair at J=1, near-dup pair present,
    // unrelated doc clean
    val pairs = MinHashDedup.nearDupPairs(pathological, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val copyPairs = pairs.filter(_._3 == 1.0)
    assert(copyPairs.length == n.toLong * (n - 1) / 2,
      s"copy pairs: ${copyPairs.length}")
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    // near-dup 1 pairs with doc 0 only, not with every copy? No — J(1, copy)
    // equals J(1, 0) for every copy, so 1 pairs with ALL of them. Check one.
    assert(pairs.exists(p => p._1 == 1L && p._2 == 100L))
  }

  test("LSH exchanges move ids and band keys, never text") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    for (df <- Seq(MinHashDedup.candidatePairs(docs),
        SimHashDedup.bandedPairs(docs, 3))) {
      val root = df.queryExecution.executedPlan
      val plan = root match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val moved = plan.collect {
        case e: ShuffleExchangeExec => e.output
        case e: BroadcastExchangeExec => e.output
      }
      assert(moved.nonEmpty, "candidate stage has at least one exchange")
      moved.foreach(attrs =>
        assert(!attrs.exists(_.name == "text"),
          s"text rides an exchange: ${attrs.map(_.name)}"))
    }
  }

  test("simhash: exact-copy floods bounded and output unchanged") {
    val n = 201
    val hmap = pathological.selectExpr("doc_id", "md5(text) AS h")
    val reps = pathological.join(
      hmap.groupBy("h").agg(org.apache.spark.sql.functions.min("doc_id")
        .as("doc_id")).select("doc_id"), Seq("doc_id"), "left_semi")
    val candN = SimHashDedup.bandedPairs(reps, 3).count()
    assert(candN <= 3, s"banded candidates after pre-dedup: $candN")

    val pairs = SimHashDedup.nearDupPairs(pathological, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val zero = pairs.filter(_._3 == 0)
    assert(zero.length >= n.toLong * (n - 1) / 2)
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }
}
