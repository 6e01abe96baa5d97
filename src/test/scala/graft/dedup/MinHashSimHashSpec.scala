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
}
