package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity join with length-banded blocking.
  *
  * Semantics: all pairs with |n_chars difference| ≤ `lengthBand` and
  * word-bigram Jaccard ≥ `threshold`. A 0.7-Jaccard pair cannot differ
  * hugely in length, so the length band is a sound blocking key.
  *
  * Execution: instead of a cross join, each doc is assigned to bucket
  * floor(n_chars/band) and one side is expanded to {b-1, b, b+1}; the
  * banded equi-join then covers every pair within the band predicate,
  * which is re-checked exactly. At 100 TB this is an equi-shuffle on
  * (bucket), never a cartesian.
  */
object NgramJaccard {

  /** Salt fan-out for the banded self-join; ≥ the core count ÷ expected
    * bucket count keeps every core busy on clustered-length corpora.
    */
  val Salts = 8

  def bigrams(textCol: String): org.apache.spark.sql.Column =
    MinHashDedup.shingles(col(textCol), 2)

  def similarPairs(docs: DataFrame, threshold: Double = 0.7,
      lengthBand: Int = 50): DataFrame = {
    // shingles are hashed to sorted longs once per doc in the scan stage;
    // the banded join then shuffles packed longs, prunes on the free
    // size-ratio bound (J ≤ |smaller|/|larger|), and merge-scans the
    // survivors with a native expression — see JaccardOps.
    // repartition the RAW text before the shingle-hash-sort expression:
    // the test tables are single files (one input split), so the heavy
    // per-doc expression would otherwise run on one task per join side.
    // The exchange carries cheap raw text, is deduplicated across the
    // self-join's two branches by ReuseExchange, and the per-doc sketch
    // computes at full width downstream of it.
    val base = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("n_chars"),
        graft.functions.JaccardOps.sorted_shingle_hashes(col("text"), 2)
          .as("grams"))
      .withColumn("n_grams", size(col("grams")))
    // Length buckets are inherently LOW-cardinality for natural text
    // (lengths cluster), so the banded join alone degenerates to a
    // handful of serial tasks — measured as a 2s single-task stage doing
    // most of this query at sf0.1. Salting fans each bucket into `Salts`
    // cells: the exploded side carries a deterministic doc-hash salt, the
    // other side is replicated across all salt values (the SkewJoin
    // pattern, inlined because this is a SELF join with a compound band
    // predicate). Every pair still meets exactly once; the replicated
    // side pays a bounded Salts× shuffle in exchange for unbounded task
    // skew. Prefix filtering (PPJoin) was measured as an alternative and
    // REJECTED for this corpus shape: a dense shingle vocabulary makes
    // prefix-token candidates 4× the banded count.
    val bkt = (col("n_chars") / lengthBand).cast("long")
    val a = base
      .withColumn("bucket", explode(array(bkt - 1, bkt, bkt + 1)))
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(Salts)))
    val b = base
      .withColumn("bucket", bkt)
      .withColumn("salt",
        explode(array((0 until Salts).map(i => lit(i.toLong)): _*)))
    a.alias("a")
      .join(b.alias("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.salt") === col("b.salt") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.n_chars") - col("b.n_chars")) <= lengthBand &&
          least(col("a.n_grams"), col("b.n_grams")).cast("double") >=
            greatest(col("a.n_grams"), col("b.n_grams")) * threshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        // threshold-aware merge scan with positional early exit
        graft.functions.JaccardOps.jaccard_sorted_min(col("a.grams"),
          col("b.grams"), threshold).as("j"))
      // threshold BEFORE the pair-dedup shuffle: only survivors (a
      // vanishing fraction) pay the distinct; bucket-duplicate pairs
      // just recompute the cheap merge scan map-side
      .filter(col("j") >= threshold)
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
  }

  private val pairsQ = Q(
    "d_ngram_jaccard_pairs",
    (s, d) => similarPairs(Tables(s, d).documents, 0.7, 50),
    Some(
      """WITH g AS (
        |  SELECT doc_id, n_chars,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text,' ')) - 1, 1) + 1),
        |      i -> concat_ws(' ', string_split(text,' ')[i],
        |                          string_split(text,' ')[i+1]))) AS grams
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
        |FROM g a JOIN g b
        |  ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 50
        |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |      len(list_distinct(list_concat(a.grams, b.grams))) >= 0.7""".stripMargin),
  )

  /** Asymmetric n-gram CONTAINMENT join — the near-dup relation Jaccard
    * is blind to: a short excerpt quoted inside a long document has
    * tiny Jaccard (the union is dominated by the long side) but
    * containment |A∩B| / min(|A|,|B|) ≈ 1. Quote/subset detection is
    * its own curation stage (boilerplate-in-page, excerpt-of-source,
    * license-text riders), and length banding is structurally WRONG for
    * it — the interesting pairs differ in length by design — so the
    * blocking changes too: an inverted gram index restricted to
    * DISCRIMINATIVE grams (document frequency ≤ [[DfCap]], the
    * stop-gram removal every production containment system applies).
    * The df cap is part of the operator's semantics (both engines score
    * over rare grams only), and it is also the scale bound: candidate
    * work is Σ_g df(g)² ≤ DfCap · Σ_g df(g) — LINEAR in corpus size,
    * where the uncapped index is quadratic at every hot gram. The gram
    * join here carries gram strings for oracle parity; at fleet scale
    * the same plan runs on the 8-byte FNV gram hashes
    * ([[graft.functions.JaccardOps]]) with identical structure.
    */
  val DfCap = 20

  def containmentPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val base = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        array_distinct(MinHashDedup.shingles(col("text"), 3)).as("grams"))
    // grams are hashed to 8-byte keys BEFORE any shuffle: the df count,
    // the rare filter and the candidate self-join never move gram text,
    // only (doc_id, hash) pairs — the same plan at fleet scale, where
    // shuffling the gram strings is the dominant byte cost. xxhash64
    // collisions would need two distinct grams in one doc pair's rare
    // set (~|grams|²/2⁶⁴); a collision-conscious deployment re-verifies
    // survivors exactly, which threshold re-checking here already does.
    val inv = base
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
    val rare = inv.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= DfCap).select("h")
    // the rare postings feed three consumers (both self-join sides and
    // the per-doc rare-gram counts); the shuffles reuse across branches
    // via ReuseExchange, and an explicit localCheckpoint was measured
    // 4.5× SLOWER here — the row materialisation costs more than the
    // deduplicated recompute it saves
    val rg = inv.join(rare, "h")
    val nr = rg.groupBy("doc_id").agg(count(lit(1)).as("nr"))
    // the candidate self-join is pinned to a SHUFFLED hash join: AQE's
    // size estimate happily broadcasts the full postings list (it is
    // "small" in bytes), but building that hash map in every task was
    // measured 2× slower than the h-partitioned join here — and at
    // fleet scale a broadcast postings list is a non-starter anyway
    val shared = rg.alias("a")
      .join(rg.alias("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(nr.select(col("doc_id").as("doc_a"), col("nr").as("n_a")), "doc_a")
      .join(nr.select(col("doc_id").as("doc_b"), col("nr").as("n_b")), "doc_b")
      .withColumn("containment",
        round(col("shared").cast("double") /
          least(col("n_a"), col("n_b")), 4))
      .filter(col("containment") >= threshold)
      .select("doc_a", "doc_b", "shared", "n_a", "n_b", "containment")
  }

  private val containQ = Q(
    "d_ngram_containment_pairs",
    (s, d) => containmentPairs(Tables(s, d).documents, 0.8),
    Some(
      s"""WITH dd AS (SELECT doc_id, string_split(text, ' ') AS w
         |           FROM documents),
         |g AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    range(greatest(len(w) - 2, 1)),
         |    i -> array_to_string(w[i+1:i+3], ' '))) AS grams
         |  FROM dd),
         |inv AS (SELECT doc_id, unnest(grams) AS g FROM g),
         |rare AS (SELECT g FROM (SELECT g, count(*) AS df FROM inv
         |                        GROUP BY 1) WHERE df <= $DfCap),
         |rg AS (SELECT inv.doc_id, inv.g FROM inv JOIN rare USING (g)),
         |nr AS (SELECT doc_id, count(*) AS nr FROM rg GROUP BY 1),
         |sh AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM rg a JOIN rg b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT sh.doc_a, sh.doc_b, CAST(sh.shared AS BIGINT) AS shared,
         |  CAST(na.nr AS BIGINT) AS n_a, CAST(nb.nr AS BIGINT) AS n_b,
         |  round(CAST(sh.shared AS DOUBLE) / least(na.nr, nb.nr), 4)
         |    AS containment
         |FROM sh JOIN nr na ON sh.doc_a = na.doc_id
         |        JOIN nr nb ON sh.doc_b = nb.doc_id
         |WHERE round(CAST(sh.shared AS DOUBLE) / least(na.nr, nb.nr), 4)
         |  >= 0.8""".stripMargin),
  )

  def queries: Seq[Q] = Seq(pairsQ, containQ)
}
