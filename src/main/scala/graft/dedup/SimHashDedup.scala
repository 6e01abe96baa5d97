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
    *
    * `fnv = true` swaps the token hash from XXH64 to the repo's FNV-1a
    * fold — identical vote/band logic, but the fingerprint is replayable
    * in SQL, so the registered queries run FNV mode and get hash-exact
    * DuckDB oracles (the XXH64 path keeps its spec coverage).
    */
  def fingerprints(docs: DataFrame, fnv: Boolean = false): DataFrame =
    docs.select(col("doc_id"),
      (if (fnv) graft.functions.TextSketches.simhash_fnv(col("text"))
       else graft.functions.TextSketches.simhash(col("text"))).as("simhash"))

  /** Banded candidate join + Hamming verify among `docs` (doc_a < doc_b).
    * Package-visible so the hot-bucket spec can measure the candidate
    * stage directly.
    */
  private[dedup] def bandedPairs(docs: DataFrame, maxHamming: Int,
      fnv: Boolean = false): DataFrame = {
    val fp = fingerprints(docs, fnv)
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
  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3,
      fnv: Boolean = false): DataFrame = {
    val hmap = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val rep = hmap.groupBy("h").agg(min(col("doc_id")).as("rep"))
    val members = hmap.join(rep, "h")
      .select(col("rep"), col("doc_id").as("member"))
    val reps = docs.join(
      members.filter(col("member") === col("rep"))
        .select(col("member").as("doc_id")),
      Seq("doc_id"), "left_semi")

    val cross = bandedPairs(reps, maxHamming, fnv)
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

  /** Shared oracle fragment: FNV-1a per token via a recursive CTE (one
    * byte per step, HUGEINT mod 2^64 — the same replay the multimodal
    * checksum oracle uses), then the ±1 bit votes and the fingerprint
    * assembled from two 32-bit halves (DuckDB's `<<` is BIGINT-typed, so
    * 1<<63 would overflow; 2^32·hi + lo sidesteps it). Expects a `reps`
    * CTE (doc_id, text) to fingerprint; yields `fp(doc_id, ufp UBIGINT)`.
    */
  private def fnvFingerprintCtes(src: String): String =
    s"""${graft.functions.OracleSql.tokenItems(src)},
       |${graft.functions.OracleSql.fnvFold("tok")},
       |bits AS (SELECT doc_id, h, unnest(range(64)) AS b FROM done),
       |votes AS (
       |  SELECT doc_id, b,
       |    sum(CASE WHEN (h >> CAST(b AS UBIGINT)) & 1 = 1
       |        THEN 1 ELSE -1 END) AS v
       |  FROM bits GROUP BY 1, 2),
       |fp AS (
       |  SELECT doc_id,
       |    CAST(CAST(sum(CASE WHEN v > 0 AND b >= 32
       |          THEN CAST(1 AS BIGINT) << (b - 32) ELSE 0 END) AS HUGEINT)
       |      * CAST('4294967296' AS HUGEINT)
       |    + CAST(sum(CASE WHEN v > 0 AND b < 32
       |          THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS HUGEINT)
       |      AS UBIGINT) AS ufp
       |  FROM votes GROUP BY 1)""".stripMargin

  private val fpQ = Q(
    "d_simhash_fingerprints",
    (s, d) => fingerprints(Tables(s, d).documents, fnv = true),
    Some(
      s"""WITH RECURSIVE
         |${fnvFingerprintCtes("documents")}
         |SELECT doc_id,
         |  CAST(CASE WHEN ufp >= CAST('9223372036854775808' AS HUGEINT)
         |    THEN ufp - CAST('18446744073709551616' AS HUGEINT)
         |    ELSE CAST(ufp AS HUGEINT) END AS BIGINT) AS simhash
         |FROM fp""".stripMargin),
  )

  private val pairsQ = Q(
    "d_simhash_pairs",
    (s, d) => nearDupPairs(Tables(s, d).documents, 3, fnv = true),
    // replays the full pipeline: md5 exemplars, FNV fingerprints on reps
    // only, 4×16-bit band join, Hamming verify, member re-expansion
    Some(
      s"""WITH RECURSIVE
         |hm AS (SELECT doc_id, md5(text) AS mh FROM documents),
         |rp AS (SELECT mh, min(doc_id) AS rep FROM hm GROUP BY mh),
         |mem AS (SELECT r.rep, m.doc_id AS member
         |        FROM hm m JOIN rp r ON m.mh = r.mh),
         |reps AS (SELECT d.doc_id, d.text
         |         FROM documents d JOIN rp r ON d.doc_id = r.rep),
         |${fnvFingerprintCtes("reps")},
         |bk AS (SELECT doc_id, ufp, unnest(range(4)) AS band FROM fp),
         |bkk AS (SELECT doc_id, ufp, band,
         |          CAST((ufp >> CAST(band * 16 AS UBIGINT)) & 65535
         |            AS BIGINT) AS key
         |        FROM bk),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS ra, b.doc_id AS rb,
         |    CAST(bit_count(xor(a.ufp, b.ufp)) AS INT) AS hamming
         |  FROM bkk a JOIN bkk b
         |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.ufp, b.ufp)) <= 3),
         |crossp AS (
         |  SELECT least(ma.member, mb.member) AS doc_a,
         |         greatest(ma.member, mb.member) AS doc_b, c.hamming
         |  FROM cand c JOIN mem ma ON c.ra = ma.rep
         |              JOIN mem mb ON c.rb = mb.rep),
         |within AS (
         |  SELECT x.member AS doc_a, y.member AS doc_b,
         |    CAST(0 AS INT) AS hamming
         |  FROM mem x JOIN mem y
         |    ON x.rep = y.rep AND x.member < y.member)
         |SELECT * FROM crossp UNION ALL SELECT * FROM within""".stripMargin),
  )

  def queries: Seq[Q] = Seq(fpQ, pairsQ)
}
