package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting (Charikar'02 / Manku et al.
  * WWW'07): 64-bit fingerprint whose bits are the signs of the summed
  * ±1 votes of each token's hash bits; near-dups have small Hamming
  * distance.
  *
  * Distributed shape: explode tokens → 64 conditional-sum aggregates
  * (map-side combined, one shuffle keyed by doc) → assemble fingerprint
  * → 4×16-bit band blocking for the pair search (Hamming ≤ k with k < 4
  * guarantees at least one identical band — pigeonhole), verify with
  * `bit_count(a XOR b)`.
  */
object SimHashDedup {

  private val Bits = 64
  private val Bands = 4
  private val BandBits = Bits / Bands // 16

  /** (doc_id, simhash) 64-bit fingerprints over word unigrams — one
    * codegen'd expression per row ([[graft.functions.TextSketches]]):
    * no token explode, no 64-column vote aggregate, no shuffle.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TextSketches.simhash(col("text")).as("simhash"))

  /** Banded candidate join + Hamming verify among `docs` (doc_a < doc_b).
    * Package-visible so the hot-bucket spec can measure the candidate
    * stage directly.
    */
  private[dedup] def bandedPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val fp = fingerprints(docs)
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * BandBits)
          .bitwiseAND((1L << BandBits) - 1).as("key"))
    }
    val buckets = fp
      .select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming) // before the dedup shuffle
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Pairs with Hamming distance ≤ `maxHamming` (< Bands for recall=1).
    *
    * Hot-bucket hardening (same scheme as [[MinHashDedup.nearDupPairs]]):
    * identical texts share all four band keys, so the banded join runs on
    * one exemplar per md5(text) group; exemplar pairs expand back to
    * members and within-group pairs are emitted directly with Hamming 0.
    * Output identical, candidate volume bounded by distinct texts.
    */
  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val hmap = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val rep = hmap.groupBy("h").agg(min(col("doc_id")).as("rep"))
    val members = hmap.join(rep, "h")
      .select(col("rep"), col("doc_id").as("member"))
    val reps = docs.join(
      members.filter(col("member") === col("rep"))
        .select(col("member").as("doc_id")),
      Seq("doc_id"), "left_semi")

    val cross = bandedPairs(reps, maxHamming)
      .join(members.select(col("rep").as("doc_a"), col("member").as("ma")),
        "doc_a")
      .join(members.select(col("rep").as("doc_b"), col("member").as("mb")),
        "doc_b")
      .select(least(col("ma"), col("mb")).as("doc_a"),
        greatest(col("ma"), col("mb")).as("doc_b"), col("hamming"))
    val within = members.alias("x")
      .join(members.alias("y"),
        col("x.rep") === col("y.rep") && col("x.member") < col("y.member"))
      .select(col("x.member").as("doc_a"), col("y.member").as("doc_b"),
        lit(0).as("hamming"))
    cross.union(within)
  }

  private val fpQ = Q(
    "d_simhash_fingerprints",
    (s, d) => fingerprints(Tables(s, d).documents),
    None, // xxhash64 not reproducible in DuckDB — spec-verified instead
  )

  private val pairsQ = Q(
    "d_simhash_pairs",
    (s, d) => nearDupPairs(Tables(s, d).documents, 3),
    None,
  )

  def queries: Seq[Q] = Seq(fpQ, pairsQ)
}
