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
  def signatures(docs: DataFrame, fnv: Boolean = false): DataFrame = {
    val sigCol =
      if (fnv) graft.functions.TextSketches.minhash_signature_fnv(col("text"))
      else graft.functions.TextSketches.minhash_signature(col("text"))
    val sig = docs.select(col("doc_id"), shingles(col("text")).as("sh"),
      sigCol.as("sig"))
    val mCols = (0 until NumHashes).map(j =>
      element_at(col("sig"), j + 1).as(s"m$j"))
    sig.select(col("doc_id") +: col("sh") +: mCols: _*)
  }

  /** LSH candidate pairs (doc_a < doc_b) among `docs`, deduplicated.
    * Package-visible so the hot-bucket spec can measure the candidate
    * stage directly.
    */
  private[dedup] def candidatePairs(docs: DataFrame): DataFrame = {
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
    buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Near-duplicate pairs with exact shingle Jaccard ≥ `threshold`.
    *
    * Stage 0 — hot-bucket hardening: identical texts share every band
    * key, so k exact copies alone would put k docs in the same 16
    * buckets and the bucket self-join would emit O(k²) candidates
    * (web-scale boilerplate makes such buckets routinely). LSH therefore
    * runs on one EXEMPLAR per md5(text) group; exemplar pairs expand
    * back to member pairs afterwards, and within-group pairs (Jaccard
    * exactly 1) are emitted directly. Output is identical to running
    * LSH on the full corpus — the brute-force oracle still hash-matches
    * — but the candidate stage is bounded by the number of DISTINCT
    * texts, not document multiplicity.
    *
    * Join discipline for scale: the banding self-join carries only
    * (doc_id, band, key) — 20 bytes a row — and the shingle arrays are
    * attached to the *deduplicated candidate pairs* afterwards, so the
    * wide text-derived payload never rides through the LSH shuffle. The
    * pre-dedup joins carry (16-byte hash, id) pairs only.
    */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    // (a scan-widening repartition was tried here and REVERTED: the added
    // exchanges cost more than the serial md5 map they parallelised —
    // the sketch expressions already run after the semi join's shuffle)
    // stage 0: one exemplar (min doc_id) per exact-content group
    val hmap = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val rep = hmap.groupBy("h").agg(min(col("doc_id")).as("rep"))
    val members = hmap.join(rep, "h")
      .select(col("rep"), col("doc_id").as("member"))
    val reps = docs.join(
      members.filter(col("member") === col("rep"))
        .select(col("member").as("doc_id")),
      Seq("doc_id"), "left_semi")

    val cand = candidatePairs(reps)
      // candidates are reused by three downstream subtrees (two id sets
      // + the verify join); checkpoint the tiny pair list so the LSH
      // join runs once, not three times
      .localCheckpoint(true)
    // shingle arrays are only materialised for candidate docs (semi join
    // first): at corpus scale candidates are a vanishing fraction
    val candIds = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val sh = reps.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    val repPairs = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))

    // expand exemplar pairs to all member pairs (groups are disjoint, so
    // each unordered pair appears exactly once)
    val cross = repPairs
      .join(members.select(col("rep").as("doc_a"), col("member").as("ma")),
        "doc_a")
      .join(members.select(col("rep").as("doc_b"), col("member").as("mb")),
        "doc_b")
      .select(least(col("ma"), col("mb")).as("doc_a"),
        greatest(col("ma"), col("mb")).as("doc_b"), col("jaccard"))
    // within-group pairs: identical text ⇒ identical shingle set ⇒ J = 1
    val within = members.alias("x")
      .join(members.alias("y"),
        col("x.rep") === col("y.rep") && col("x.member") < col("y.member"))
      .select(col("x.member").as("doc_a"), col("y.member").as("doc_b"),
        lit(1.0).as("jaccard"))
    cross.union(within)
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
      // signature dump (first 4 hash slots), FNV mode: the shingle hash is
      // the repo's FNV-1a fold (replayable by a recursive CTE) and the
      // slot hashes a BIGINT-safe universal family over 2^31-1, so the
      // minhash values themselves are hash-checked against DuckDB — the
      // XXH64 production chain keeps its spec coverage
      signatures(Tables(s, d).documents, fnv = true)
        .select("doc_id", "m0", "m1", "m2", "m3"),
    // a_j = ((j+1)·2654435761) mod p, b_j = ((j+1)·2246822519) mod p,
    // p = 2^31-1, inlined below for j = 0..3
    Some(
      s"""WITH RECURSIVE
        |${graft.functions.OracleSql.shingleItems("documents")},
        |${graft.functions.OracleSql.fnvFold("sg")},
        |hh AS (
        |  SELECT doc_id, CAST(h % 2147483647 AS BIGINT) AS h FROM done)
        |SELECT doc_id,
        |  min((506952114 * h + 99338872) % 2147483647) AS m0,
        |  min((1013904228 * h + 198677744) % 2147483647) AS m1,
        |  min((1520856342 * h + 298016616) % 2147483647) AS m2,
        |  min((2027808456 * h + 397355488) % 2147483647) AS m3
        |FROM hh GROUP BY doc_id""".stripMargin),
  )

  def queries: Seq[Q] = Seq(pairs, sigQ)
}
