package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over word shingles.
  *
  * Pipeline (all DataFrame ops, one shuffle per stage):
  *   shingle → 64 minhashes (explode + map-side-combined min agg)
  *   → 16 LSH bands of 4 → bucket self-join → exact-Jaccard verify.
  *
  * Because candidate pairs are verified with the EXACT shingle Jaccard,
  * the output equals "all pairs with J ≥ τ" up to LSH recall (miss
  * probability (1-J^4)^16 < 2e-13 at J=0.95), so a brute-force oracle
  * hash-matches. At 100 TB only the banding join sees the full corpus,
  * and it shuffles 16 longs per doc, not the text.
  */
object MinHashDedup {

  private val NumHashes = 64
  private val BandRows = 4
  private val NumBands = NumHashes / BandRows // 16

  // hash family: h_j(x) = xxhash64(j, xxhash64(x)) — salt-mixed, no
  // overflow under ANSI mode, deterministic across runs and partitions

  /** Word n-gram shingles of `text`, distinct, as an array column —
    * a native expression ([[graft.functions.TextSketches.shingles]]);
    * the equivalent higher-order-function formulation runs interpreted
    * per element and was the pipeline's bottleneck.
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.TextSketches.shingles(text, n)

  /** (doc_id, shingles, m0..m63) minhash signatures. The whole sketch is
    * one codegen'd expression ([[graft.functions.TextSketches]]) inside
    * the scan — no token explode, no 64-column aggregate, no shuffle —
    * with values bit-identical to the min-over-exploded-shingles
    * formulation (same XXH64 seed chain).
    */
  def signatures(docs: DataFrame): DataFrame = {
    val sig = docs.select(col("doc_id"), shingles(col("text")).as("sh"),
      graft.functions.TextSketches.minhash_signature(col("text")).as("sig"))
    val mCols = (0 until NumHashes).map(j =>
      element_at(col("sig"), j + 1).as(s"m$j"))
    sig.select(col("doc_id") +: col("sh") +: mCols: _*)
  }

  /** Near-duplicate pairs with exact shingle Jaccard ≥ `threshold`.
    *
    * Join discipline for scale: the banding self-join carries only
    * (doc_id, band, key) — 20 bytes a row — and the shingle arrays are
    * attached to the *deduplicated candidate pairs* afterwards, so the
    * wide text-derived payload never rides through the LSH shuffle.
    */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val sig = docs.select(col("doc_id"),
      graft.functions.TextSketches.minhash_signature(col("text")).as("sig"))
    val bandCols = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until BandRows).map(r =>
          element_at(col("sig"), b * BandRows + r + 1)): _*).as("key"))
    }
    val buckets = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    val cand = buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      // candidates are reused by three downstream subtrees (two id sets
      // + the verify join); checkpoint the tiny pair list so the LSH
      // join runs once, not three times
      .localCheckpoint(true)
    // shingle arrays are only materialised for candidate docs (semi join
    // first): at corpus scale candidates are a vanishing fraction
    val candIds = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val sh = docs.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  private val pairs = Q(
    "d_minhash_lsh_pairs",
    (s, d) => nearDupPairs(Tables(s, d).documents, 0.8),
    // brute-force exact-Jaccard oracle: LSH verify makes them equivalent
    Some(
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
        |      i -> concat_ws(' ', string_split(text,' ')[i],
        |                          string_split(text,' ')[i+1],
        |                          string_split(text,' ')[i+2]))) AS sh
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8""".stripMargin),
  )

  private val sigQ = Q(
    "d_minhash_signatures",
    (s, d) =>
      // signature dump (first 4 hash slots) — deterministic, rows-only check
      signatures(Tables(s, d).documents)
        .select("doc_id", "m0", "m1", "m2", "m3"),
    None,
  )

  def queries: Seq[Q] = Seq(pairs, sigQ)
}
