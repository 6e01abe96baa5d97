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

  /** Pairs with Hamming distance ≤ `maxHamming` (< Bands for recall=1). */
  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
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
