package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators (the LLM-pipeline surface beyond
  * dedup): reproducible splits, length-bucketed batching, benchmark
  * decontamination. All deterministic and cross-engine checkable.
  */
object Curation {

  /** Incremental dedup against an already-ingested corpus: a broadcast
    * Bloom filter over the seen keys prefilters the batch, and only the
    * (few) possible-duplicates pay the exact anti-join — the standard
    * shape for continuous ingest, where re-shuffling the whole history
    * per batch is the thing that doesn't scale. Bloom filters have no
    * false negatives, so the result EQUALS the plain anti-join (the
    * false positives are removed by the verify join) — which is exactly
    * what the oracle checks.
    *
    * The Bloom build is an explicit first phase (one aggregation over
    * `seen`, collected to the driver and broadcast) — documented eager
    * step, same contract as any broadcast-structure build. At 100 TB
    * keep one bloom per seen-shard and OR them, or size `expected`
    * to the shard.
    */
  def incrementalDedup(batch: DataFrame, seen: DataFrame, keyCol: String,
      expected: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = seen.stat.bloomFilter(keyCol, expected, fpp)
    val b = batch.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: String) => k != null && b.value.mightContainString(k))
    val definitelyNew = batch.filter(!mightContain(col(keyCol)))
    val verified = batch.filter(mightContain(col(keyCol)))
      .join(seen.select(col(keyCol)), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(verified)
  }

  private val split = Q(
    "t_train_test_split",
    (s, d) =>
      // deterministic 80/20 split from a content-independent key hash —
      // reproducible across engines, runs and partitionings (md5-prefix
      // arithmetic rather than engine-specific RNG)
      Tables(s, d).documents
        .withColumn("bucket",
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("int") % 100)
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < 80, "train").otherwise("test").as("split")),
    Some(
      """SELECT doc_id,
        |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |    AS INTEGER) % 100 AS bucket,
        |  CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
        |    1, 4)) AS INTEGER) % 100 < 80 THEN 'train' ELSE 'test' END
        |    AS split
        |FROM documents""".stripMargin),
  )

  private val batches = Q(
    "t_length_batches",
    (s, d) => {
      // length-bucketed batch assignment (similar-length docs batch
      // together => minimal padding waste); ntile over a total order
      val nTok = size(org.apache.spark.sql.functions.split(col("text"), " "))
      Tables(s, d).documents
        .withColumn("n_tok", nTok)
        .withColumn("batch", ntile(20).over(
          Window.orderBy(desc("n_tok"), asc("doc_id"))))
        .select("doc_id", "n_tok", "batch")
    },
    Some(
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
        |  CAST(ntile(20) OVER (ORDER BY len(string_split(text, ' ')) DESC,
        |    doc_id ASC) AS INT) AS batch
        |FROM documents""".stripMargin),
  )

  private val batchesSharded = Q(
    "t_length_batches_sharded",
    (s, d) => {
      // the 100 TB form of length-bucketed batching: shard by content
      // hash first, then ntile WITHIN each shard — every window sort is
      // per-shard (parallel, bounded memory) instead of one global total
      // order. Padding waste is near-identical because length
      // distributions are shard-invariant under content hashing.
      val nTok = size(org.apache.spark.sql.functions.split(col("text"), " "))
      Tables(s, d).documents
        .withColumn("n_tok", nTok)
        .withColumn("shard", pmod(col("doc_id"), lit(8)).cast("int"))
        .withColumn("batch", ntile(20).over(
          Window.partitionBy("shard").orderBy(desc("n_tok"), asc("doc_id"))))
        .select("doc_id", "shard", "n_tok", "batch")
    },
    Some(
      """SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
        |  CAST(ntile(20) OVER (PARTITION BY doc_id % 8
        |    ORDER BY len(string_split(text, ' ')) DESC, doc_id ASC) AS INT)
        |    AS batch
        |FROM documents""".stripMargin),
  )

  private val decontaminate = Q(
    "d_decontaminate",
    (s, d) => {
      // benchmark decontamination: flag corpus docs sharing any 5-gram
      // with the "benchmark" set (here: doc_id < 5). The benchmark's
      // n-gram set is broadcast; the corpus side is a map + semi join —
      // no pairwise comparison, scales with corpus size only.
      val docs = Tables(s, d).documents
      val grams5 = graft.functions.TextSketches.shingles(col("text"), 5)
      val bench = docs.filter(col("doc_id") < 5)
        .select(explode(grams5).as("g")).distinct()
      val corpus = docs.filter(col("doc_id") >= 5)
        .select(col("doc_id"), explode(grams5).as("g"))
      val contaminated = corpus
        .join(broadcast(bench), Seq("g"), "left_semi")
        .select("doc_id").distinct()
      docs.filter(col("doc_id") >= 5).select("doc_id")
        .join(contaminated.withColumn("contaminated", lit(true)),
          Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("contaminated"), lit(false)).as("contaminated"))
    },
    Some(
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text,' ')) - 4, 1) + 1),
        |      i -> concat_ws(' ', string_split(text,' ')[i],
        |                          string_split(text,' ')[i+1],
        |                          string_split(text,' ')[i+2],
        |                          string_split(text,' ')[i+3],
        |                          string_split(text,' ')[i+4]))) AS sh
        |  FROM documents),
        |bench AS (
        |  SELECT list(DISTINCT g) AS bg FROM (
        |    SELECT unnest(sh) AS g FROM sh WHERE doc_id < 5))
        |SELECT s.doc_id, len(list_intersect(s.sh, b.bg)) > 0 AS contaminated
        |FROM sh s CROSS JOIN bench b
        |WHERE s.doc_id >= 5""".stripMargin),
  )

  private val incremental = Q(
    "d_incremental_dedup",
    (s, d) => {
      // continuous-ingest shape: docs 0-249 are the ingested history,
      // docs 200+ the arriving batch — content keys of 200-249 are
      // already seen and must drop
      val docs = Tables(s, d).documents
        .select(col("doc_id"), md5(col("text")).as("content_key"))
      incrementalDedup(
        docs.filter(col("doc_id") >= 200),
        docs.filter(col("doc_id") < 250),
        "content_key", expected = 10000L)
        .select("doc_id", "content_key")
    },
    Some(
      """SELECT doc_id, md5(text) AS content_key
        |FROM documents
        |WHERE doc_id >= 200
        |  AND md5(text) NOT IN (
        |    SELECT md5(text) FROM documents WHERE doc_id < 250)""".stripMargin),
  )

  /** Sequence packing: assign documents to fixed-token-budget training
    * sequences (the pre-tokenisation step that turns a corpus into
    * model-ready samples). A running token sum inside each content-hash
    * shard, floor-divided by the budget — deterministic, and the window
    * sort is per-shard (the global-order variant is the thing that
    * cannot scale). Docs larger than the budget get their own sequence
    * by construction (the running sum jumps a whole bin).
    */
  private val packing = Q(
    "t_sequence_packing",
    (s, d) => {
      val budget = 512L
      val nTok = size(org.apache.spark.sql.functions.split(col("text"), " "))
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, d).documents
        .withColumn("n_tok", nTok.cast("long"))
        .withColumn("shard", pmod(col("doc_id"), lit(8)).cast("int"))
        .withColumn("seq_id",
          floor(coalesce(sum(col("n_tok")).over(w), lit(0L)) / budget))
        .select("doc_id", "shard", "n_tok", "seq_id")
    },
    Some(
      """SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(floor(CAST(coalesce(sum(len(string_split(text, ' ')))
        |      OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) / 512.0) AS BIGINT) AS seq_id
        |FROM documents""".stripMargin),
  )

  /** Domain-mixture sampling — the "data mixture" step of a training-data
    * pipeline: per domain (here `lang`), admit documents in a
    * deterministic content-hash order until the domain's token budget is
    * exhausted. Hash order (not quality order) makes the sample an
    * unbiased, reproducible draw per domain — the same property the
    * train/test split gets from md5-prefix arithmetic — and the running
    * token total turns per-domain WEIGHTS into per-domain token COUNTS,
    * which is how mixtures are actually specified for LLM corpora.
    *
    * Scale shape: one window per domain — partition-parallel, sorts only
    * within a domain. For one giant domain, compose with the shard trick
    * of `t_length_batches_sharded` (budget split across shards).
    */
  private val mixture = Q(
    "t_domain_mixture",
    (s, d) => {
      val nTok = size(org.apache.spark.sql.functions.split(col("text"), " "))
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("text")), col("doc_id"))
      Tables(s, d).documents
        .withColumn("n_tok", nTok)
        .withColumn("cum_tok",
          sum(col("n_tok").cast("long")).over(w))
        .filter(col("cum_tok") <= 2000)
        .select(col("doc_id"), col("lang"), col("n_tok"), col("cum_tok"))
    },
    Some(
      """SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
        |  CAST(cum AS BIGINT) AS cum_tok
        |FROM (
        |  SELECT doc_id, lang, text,
        |    sum(len(string_split(text, ' '))) OVER (PARTITION BY lang
        |      ORDER BY md5(text), doc_id) AS cum
        |  FROM documents)
        |WHERE cum <= 2000""".stripMargin),
  )

  /** Cross-document duplicate-n-gram fraction (RefinedWeb-style quality
    * cut): for each doc, the fraction of its DISTINCT word 5-grams that
    * also occur in at least one other document; boilerplate-heavy docs
    * score high and are cut. Distinct from `d_decontaminate` (overlap vs
    * an external benchmark set) and `t_repetition_filter` (WITHIN-doc
    * repetition) — this one needs the corpus-wide gram frequency.
    *
    * Scale shape: explode → one hash aggregate keyed by gram (high
    * cardinality, map-side combined) → join back on gram → per-doc
    * aggregate. Everything is linear in total gram count; the dup/total
    * ratio is exact integer division, so it hashes identically across
    * engines.
    */
  private val crossdoc = Q(
    "t_crossdoc_ngram_dup",
    (s, d) => {
      val words = org.apache.spark.sql.functions.split(col("text"), " ")
      val g5 = when(size(words) >= 5,
        transform(sequence(lit(1), size(words) - 4), i =>
          concat_ws(" ", element_at(words, i), element_at(words, i + 1),
            element_at(words, i + 2), element_at(words, i + 3),
            element_at(words, i + 4)))).otherwise(array())
      val docs = Tables(s, d).documents
      val grams = docs.select(col("doc_id"),
        explode(array_distinct(g5)).as("g"))
      val gramDf = grams.groupBy("g").agg(count(lit(1)).as("nd"))
      val perDoc = grams.join(gramDf, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          (coalesce(col("n_dup"), lit(0L)).cast("double") /
            greatest(coalesce(col("n_grams"), lit(0L)), lit(1L)))
            .as("dup_frac"))
        .withColumn("keep", col("dup_frac") <= 0.3)
    },
    Some(
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(CASE
        |    WHEN len(string_split(text, ' ')) >= 5 THEN
        |      list_transform(range(1, len(string_split(text, ' ')) - 3),
        |        i -> concat_ws(' ', string_split(text, ' ')[i],
        |          string_split(text, ' ')[i+1], string_split(text, ' ')[i+2],
        |          string_split(text, ' ')[i+3], string_split(text, ' ')[i+4]))
        |    ELSE [] END)) AS gram
        |  FROM documents),
        |freq AS (SELECT gram, count(*) AS nd FROM g GROUP BY gram),
        |per_doc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |  FROM g JOIN freq USING (gram) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(p.n_grams, 0) AS n_grams,
        |  CAST(COALESCE(p.n_dup, 0) AS DOUBLE)
        |    / greatest(COALESCE(p.n_grams, 0), 1) AS dup_frac,
        |  CAST(COALESCE(p.n_dup, 0) AS DOUBLE)
        |    / greatest(COALESCE(p.n_grams, 0), 1) <= 0.3 AS keep
        |FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id""".stripMargin),
  )

  /** Overlapping token-window chunking (the RAG/embedding prep step):
    * every document yields chunks of `chunkTokens` words starting at
    * multiples of `stride` (stride < chunk ⇒ overlap). Pure map stage —
    * sequence + posexplode + slice inside one codegen span, no shuffle,
    * no UDF; output size is (1/stride) × corpus tokens regardless of
    * document skew, so a 100 TB corpus chunks at scan speed.
    */
  /** Shared chunk fan-out: chunks of `chunk` words starting at multiples
    * of `stride` → (doc_id, chunk_id, chunk, n_tok). One codegen span,
    * no shuffle. The SQL twin below must stay in lockstep.
    */
  private def chunkStage(docs: DataFrame, chunk: Int, stride: Int): DataFrame = {
    val words = org.apache.spark.sql.functions.split(col("text"), " ")
    docs
      .select(col("doc_id"), words.as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0), greatest(size(col("w")) - 1, lit(0)),
          lit(stride))).as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id"),
        array_join(slice(col("w"), col("start") + 1, lit(chunk)), " ")
          .as("chunk"),
        least(size(col("w")) - col("start"), lit(chunk)).as("n_tok"))
  }

  /** SQL twin of [[chunkStage]]: CTEs yielding `ch(doc_id, chunk_id,
    * chunk, n_tok)` over `documents`.
    */
  private def chunkCtes(chunk: Int, stride: Int): String =
    s"""dd AS (SELECT doc_id, string_split(text, ' ') AS w
       |            FROM documents),
       |st AS (SELECT doc_id, w,
       |         unnest(range(0, greatest(len(w) - 1, 0) + 1, $stride)) AS start
       |       FROM dd),
       |ch AS (SELECT doc_id, CAST(start // $stride AS INT) AS chunk_id,
       |         array_to_string(w[start+1:start+$chunk], ' ') AS chunk,
       |         CAST(least(len(w) - start, $chunk) AS INT) AS n_tok
       |       FROM st)""".stripMargin

  private val chunk = Q(
    "t_chunk_documents",
    (s, d) => chunkStage(Tables(s, d).documents, chunk = 32, stride = 24),
    Some(
      s"""WITH ${chunkCtes(chunk = 32, stride = 24)}
        |SELECT doc_id, chunk_id, chunk, n_tok FROM ch""".stripMargin),
  )

  /** Unigram-LM fluency score — the cheap corpus-statistics stand-in for
    * a perplexity filter (KenLM-style model inference is out of engine
    * scope): score(doc) = mean ln p(w) under the corpus unigram
    * distribution. The vocab frequency table is CAPPED at the
    * [[LmVocabCap]] most frequent tokens ((count desc, token) order, a
    * TakeOrderedAndProject — no global sort), so the broadcast is bounded
    * by construction even on a raw web-scale corpus where the tail of
    * typo-tokens would otherwise grow with the data; tokens outside the
    * cap score at a half-count OOV floor 0.5/total. Then one broadcast
    * join into the token scan and a per-doc mean; decimal-stable sum so
    * the mean is partition-order-independent.
    */
  val LmVocabCap = 65536

  /** (doc_id, n_tok, logprob) under the capped corpus unigram LM —
    * shared by `t_unigram_logprob` and `t_perplexity_buckets`.
    */
  private def unigramScores(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(org.apache.spark.sql.functions.split(col("text"), " ")).as("w"))
    val freq = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
    // total counts EVERY token (so probabilities stay normalised);
    // only the broadcast table is capped
    val tot = freq.agg(sum(col("cnt")).as("total"))
    val capped = freq.orderBy(desc("cnt"), asc("w")).limit(LmVocabCap)
    tok
      .join(broadcast(capped), Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        round(graft.util.Stable.dsum(
          log(coalesce(col("cnt").cast("double"), lit(0.5))
            / col("total").cast("double")), 6)
          / count(lit(1)), 4).as("logprob"))
  }

  /** DuckDB replay of [[unigramScores]]: CTEs + the per-doc select,
    * exposed as a full query string so callers can nest it.
    */
  private def unigramScoresSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |             FROM documents),
       |freq AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
       |tot AS (SELECT sum(cnt) AS total FROM freq),
       |capped AS (SELECT w, cnt FROM freq ORDER BY cnt DESC, w LIMIT $LmVocabCap)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |  round(${graft.util.Stable.dsumSql(
         "ln(coalesce(CAST(cnt AS DOUBLE), 0.5) / CAST(total AS DOUBLE))",
         6)}
       |    / count(*), 4) AS logprob
       |FROM tok LEFT JOIN capped USING (w) CROSS JOIN tot
       |GROUP BY doc_id""".stripMargin

  private val logprob = Q(
    "t_unigram_logprob",
    (s, d) => unigramScores(Tables(s, d).documents),
    Some(unigramScoresSql),
  )

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): rank docs by
    * LM fluency and split head / middle / tail terciles — the mixture
    * knob "train mostly on head, sample the tail" pipelines tune. Bucket
    * assignment is pure integer rank arithmetic (`(rn−1)·3 div n`), no
    * float thresholds, so the cut points are engine-exact even where
    * scores tie (ties break on doc_id). The global rank here is a window
    * over (score, doc_id) pairs only — the payload never sorts; at
    * corpus scale you'd lift the two cut scores from the mergeable
    * quantile sketch (a24) and bucket map-side, which is exactly the
    * CCNet recipe (thresholds from a sample, then a scan).
    */
  private val pplBuckets = Q(
    "t_perplexity_buckets",
    (s, d) => {
      val scores = unigramScores(Tables(s, d).documents)
      val n = scores.agg(count(lit(1)).as("n_docs"))
      val w = Window.orderBy(desc("logprob"), asc("doc_id"))
      scores
        .withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("n_tok"), col("logprob"),
          element_at(
            typedLit(Seq("head", "middle", "tail")),
            (least(lit(2), expr("(rn - 1) * 3 div n_docs")) + lit(1))
              .cast("int"))
            .as("bucket"))
    },
    Some(
      s"""WITH scores AS ($unigramScoresSql),
         |n AS (SELECT count(*) AS n_docs FROM scores),
         |ranked AS (
         |  SELECT doc_id, n_tok, logprob,
         |    row_number() OVER (ORDER BY logprob DESC, doc_id) AS rn
         |  FROM scores)
         |SELECT doc_id, n_tok, logprob,
         |  (['head', 'middle', 'tail'])[
         |    CAST(least(2, (rn - 1) * 3 // n_docs) AS INT) + 1] AS bucket
         |FROM ranked CROSS JOIN n""".stripMargin),
  )

  /** Duplicated-SPAN excision (the within/cross-doc substring dedup of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better"): any [[SpanL]]-token window whose text occurs earlier in
    * the corpus — in a lower doc_id, or earlier in the same doc — is a
    * repeat; every token covered by a repeat window is excised and the
    * survivors reassemble in order (docs that were pure boilerplate
    * collapse to ''). Lee et al. build suffix arrays; the n-gram-window
    * form here is the shuffle-friendly approximation (misses duplicates
    * only at length < SpanL, exactly like their minimum-match length).
    * Scale: three linear shuffles — gram-hash ranking (first occurrence
    * = window rank 1), covered-position set keyed by doc, doc-keyed
    * reassembly. Nothing pairwise, nothing quadratic; shuffles carry
    * md5 keys and positions, never gram text.
    */
  val SpanL = 8

  private val dedupSpans = Q(
    "t_dedup_spans",
    (s, d) => {
      val docs = Tables(s, d).documents
      val base = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.split(col("text"), " ").as("w"))
      val tok = base
        .select(col("doc_id"), posexplode(col("w")))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
      val grams = base
        .filter(size(col("w")) >= SpanL)
        .select(col("doc_id"),
          explode(sequence(lit(1), size(col("w")) - (SpanL - 1))).as("p"),
          col("w"))
        .select(col("doc_id"), col("p"),
          md5(array_join(slice(col("w"), col("p"), lit(SpanL)), " ")).as("g"))
      val wg = Window.partitionBy("g").orderBy(asc("doc_id"), asc("p"))
      val covered = grams
        .withColumn("rn", row_number().over(wg))
        .filter(col("rn") > 1)
        .select(col("doc_id"),
          explode(sequence(col("p"), col("p") + (SpanL - 1))).as("pos"))
        .distinct()
      val rebuilt = tok
        .join(covered, Seq("doc_id", "pos"), "left_anti")
        .groupBy("doc_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("tok")))).as("pt"))
        .select(col("doc_id"),
          array_join(transform(col("pt"), p => p.getField("tok")), " ")
            .as("cleaned"),
          size(col("pt")).cast("long").as("n_kept"))
      docs.select("doc_id").join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cleaned"), lit("")).as("cleaned"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
    },
    Some(
      s"""WITH dd AS (SELECT doc_id, string_split(text, ' ') AS w
         |            FROM documents),
         |tok AS (
         |  SELECT doc_id, i AS pos, w[i] AS tok
         |  FROM dd, LATERAL (SELECT unnest(range(1, len(w)+1)) AS i)),
         |grams AS (
         |  SELECT doc_id, i AS p,
         |    md5(array_to_string(w[i:i+$SpanL-1], ' ')) AS g
         |  FROM dd, LATERAL (SELECT unnest(range(1, len(w)-$SpanL+2)) AS i)
         |  WHERE len(w) >= $SpanL),
         |ranked AS (
         |  SELECT doc_id, p,
         |    row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn
         |  FROM grams),
         |covered AS (
         |  SELECT DISTINCT doc_id, p + dlt AS pos
         |  FROM (SELECT doc_id, p FROM ranked WHERE rn > 1),
         |       LATERAL (SELECT unnest(range(0, $SpanL)) AS dlt)),
         |kept AS (
         |  SELECT t.doc_id, t.pos, t.tok FROM tok t
         |  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
         |  WHERE c.doc_id IS NULL),
         |reb AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(r.cleaned, '') AS cleaned,
         |  coalesce(r.n_kept, 0) AS n_kept
         |FROM documents d LEFT JOIN reb r USING (doc_id)""".stripMargin),
  )

  /** Deterministic sharded corpus shuffle — the "global shuffle before
    * training" step, without a global sort: shard = first hex digit of a
    * salted key hash (16 shards), position = rank of the full hash within
    * the shard. Each window sorts one shard (parallel, bounded memory);
    * the concatenation shard 0..15 by position is a uniform pseudorandom
    * permutation of the corpus, reproducible from the salt alone across
    * engines, retries and repartitions.
    */
  private val shuffle = Q(
    "t_corpus_shuffle",
    (s, d) => {
      val h = md5(concat(col("doc_id").cast("string"), lit(":42")))
      val w = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
      Tables(s, d).documents
        .select(col("doc_id"), h.as("h"))
        .withColumn("shard",
          conv(substring(col("h"), 1, 1), 16, 10).cast("int"))
        .withColumn("pos", row_number().over(w))
        .select("doc_id", "shard", "pos")
    },
    Some(
      """WITH h AS (
        |  SELECT doc_id, md5(concat(CAST(doc_id AS VARCHAR), ':42')) AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS INT)
        |    AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY strpos('0123456789abcdef', substr(h, 1, 1)) - 1
        |    ORDER BY h, doc_id) AS INT) AS pos
        |FROM h""".stripMargin),
  )

  /** Exact-count stratified sample: n docs per stratum, chosen by
    * content-independent hash rank — the reproducible form of "sample k
    * per domain". One window per stratum, sorts only within the stratum.
    */
  private val stratified = Q(
    "t_stratified_sample",
    (s, d) => {
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables(s, d).documents
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 25)
        .select(col("doc_id"), col("source"), col("rk"))
    },
    Some(
      """SELECT doc_id, source, rk FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
        |  FROM documents)
        |WHERE rk <= 25""".stripMargin),
  )

  /** Chunk-level exact dedup with reassembly (the C4-style "remove
    * repeated spans corpus-wide, keep the rest of the document" pass):
    * split each doc into non-overlapping token chunks, keep only the
    * globally FIRST occurrence of each distinct chunk (by (doc_id,
    * chunk_id) — deterministic), rebuild documents from their surviving
    * chunks in order. Docs made entirely of boilerplate vanish.
    *
    * Scale shape: chunking is the zero-shuffle map above; first-
    * occurrence is one window keyed by chunk hash (high cardinality —
    * parallel); reassembly is one doc-keyed aggregate. Nothing pairwise.
    */
  private val chunkDedup = Q(
    "t_chunk_dedup_reassemble",
    (s, d) => {
      val firsts = chunkStage(Tables(s, d).documents, chunk = 32, stride = 32)
        .withColumn("rk", row_number().over(
          Window.partitionBy(md5(col("chunk")))
            .orderBy(col("doc_id"), col("chunk_id"))))
        .filter(col("rk") === 1)
      firsts.groupBy("doc_id")
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
            c => c.getField("chunk")), " ").as("clean_text"),
          count(lit(1)).as("n_kept"))
    },
    Some(
      s"""WITH ${chunkCtes(chunk = 32, stride = 32)},
        |fo AS (SELECT doc_id, chunk_id, chunk,
        |         row_number() OVER (PARTITION BY md5(chunk)
        |                            ORDER BY doc_id, chunk_id) AS rk
        |       FROM ch)
        |SELECT doc_id,
        |  string_agg(chunk, ' ' ORDER BY chunk_id) AS clean_text,
        |  CAST(count(*) AS BIGINT) AS n_kept
        |FROM fo WHERE rk = 1 GROUP BY doc_id""".stripMargin),
  )

  /** The composed curation pipeline — the end-to-end path a corpus
    * actually takes, as ONE lazy plan: exact dedup (first copy per
    * content hash) → quality gate (length + stopword ratio) →
    * benchmark decontamination (broadcast 5-gram overlap) → train split
    * (md5-bucket arithmetic) → sequence packing (per-shard token
    * budgets). Five stages, each individually oracle-green above; this
    * query hash-checks their COMPOSITION, because pipelines fail at the
    * seams (column contracts, dropped rows, stage ordering), not inside
    * stages that already pass.
    *
    * Scale shape is inherited: one content-hash window, one broadcast
    * semi join, pure-arithmetic filters, per-shard packing windows — no
    * stage is new, so neither is any shuffle.
    */
  private val pipeline = Q(
    "t_curation_pipeline",
    (s, d) => {
      val docs = Tables(s, d).documents
      val words = org.apache.spark.sql.functions.split(col("text"), " ")
      // 1. exact dedup
      val deduped = docs
        .withColumn("rk", row_number().over(
          Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
        .filter(col("rk") === 1)
      // 2. quality gate (same predicate as t_quality_filter)
      val stopN = size(filter(words,
        w => w.isInCollection(graft.text.TextQueries.stopwords)))
      val quality = deduped.filter(size(words) >= 30 &&
        stopN.cast("double") / size(words) <= 0.25)
      // 3. decontaminate vs the benchmark set (doc_id < 5), as in
      //    d_decontaminate: broadcast bench grams, semi join, anti join
      val g5 = graft.functions.TextSketches.shingles(col("text"), 5)
      val bench = docs.filter(col("doc_id") < 5)
        .select(explode(g5).as("g")).distinct()
      val corpus = quality.filter(col("doc_id") >= 5)
      val contaminated = corpus.select(col("doc_id"), explode(g5).as("g"))
        .join(broadcast(bench), Seq("g"), "left_semi")
        .select("doc_id").distinct()
      val clean = corpus.join(contaminated, Seq("doc_id"), "left_anti")
      // 4. train-side of the hash split
      val train = clean.filter(
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int") % 100 < 80)
      // 5. sequence packing (same form as t_sequence_packing)
      val wPack = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      train
        .withColumn("n_tok", size(words).cast("long"))
        .withColumn("shard", pmod(col("doc_id"), lit(8)).cast("int"))
        .withColumn("seq_id",
          floor(coalesce(sum(col("n_tok")).over(wPack), lit(0L)) / 512L))
        .select("doc_id", "shard", "n_tok", "seq_id")
    },
    Some(
      """WITH dedup AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text, row_number() OVER (PARTITION BY md5(text)
        |      ORDER BY doc_id) AS rk
        |    FROM documents)
        |  WHERE rk = 1),
        |quality AS (
        |  SELECT doc_id, text FROM dedup
        |  WHERE len(string_split(text,' ')) >= 30
        |    AND CAST(len(list_filter(string_split(text,' '),
        |         w -> w IN ('a','the','of','and'))) AS DOUBLE)
        |      / len(string_split(text,' ')) <= 0.25),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text,' ')) - 4, 1) + 1),
        |      i -> concat_ws(' ', string_split(text,' ')[i],
        |                          string_split(text,' ')[i+1],
        |                          string_split(text,' ')[i+2],
        |                          string_split(text,' ')[i+3],
        |                          string_split(text,' ')[i+4]))) AS sh
        |  FROM documents),
        |bench AS (
        |  SELECT list(DISTINCT g) AS bg FROM (
        |    SELECT unnest(sh) AS g FROM sh WHERE doc_id < 5)),
        |clean AS (
        |  SELECT q.doc_id, q.text
        |  FROM quality q JOIN sh s USING (doc_id) CROSS JOIN bench b
        |  WHERE q.doc_id >= 5 AND len(list_intersect(s.sh, b.bg)) = 0),
        |train AS (
        |  SELECT doc_id, text FROM clean
        |  WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |    AS INTEGER) % 100 < 80)
        |SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(floor(CAST(coalesce(sum(len(string_split(text, ' ')))
        |      OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) / 512.0) AS BIGINT) AS seq_id
        |FROM train""".stripMargin),
  )

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection via
    * Importance Resampling" — the hashed-n-gram form): features are
    * FNV-hashed word buckets (b = fnv1a(w) & 63: low 6 bits, identical
    * on the signed JVM long and the oracle's unsigned view); the target
    * distribution is the `lang = 'en'` slice, the proposal is the whole
    * corpus, both Laplace-smoothed over the 64 buckets. Per document,
    * weight = Σ_tokens ln(p_target(b)/p_raw(b)) — the log importance
    * ratio that DSIR resamples by.
    *
    * Exactness: each bucket's ratio is a quotient of two EXACT BIGINT
    * products ((ct+1)·(R+B) / (cr+1)·(T+B)) evaluated with a single
    * IEEE division, and the per-token ln sum goes through the 6-dp
    * decimal-stable fold ([[graft.util.Stable]]) — the same recipe that
    * keeps `t_unigram_logprob` engine-identical. Scale: two 64-row
    * aggregates broadcast back into the token scan; weighting is a pure
    * map + one doc-keyed agg. The oracle hashes DISTINCT words only, so
    * its recursive FNV fold is vocabulary-bounded.
    */
  private def dsirWeights(s: SparkSession, d: String): DataFrame = {
      val B = 64
      val tok = Tables(s, d).documents
        .select(col("doc_id"), col("lang"),
          explode(org.apache.spark.sql.functions.split(col("text"), " "))
            .as("w"))
        .withColumn("b",
          graft.functions.TextSketches.fnv1a(col("w")).bitwiseAND(lit(B - 1)))
      // ONE stats pass over the token stream: per-bucket raw and target
      // counts come from the same 64-row hash aggregate, and the totals
      // are a second (64-row) agg over that frame — not extra corpus
      // scans. The only other corpus touch is the scoring join below.
      val stats = tok.groupBy("b").agg(
        count(lit(1)).as("cr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      val tot = stats.agg(sum("ct").as("t_n"), sum("cr").as("r_n"))
      val lr = stats
        .crossJoin(broadcast(tot))
        .select(col("b"),
          log(((col("ct") + 1) * (col("r_n") + B)).cast("double")
            / ((col("cr") + 1) * (col("t_n") + B)).cast("double")).as("lr"))
      tok.join(broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          round(graft.util.Stable.dsum(col("lr"), 6), 4).as("dsir_weight"))
  }

  /** Everything up to the per-doc weight as CTEs ending in
    * `wts(doc_id, n_tok, dsir_weight)` — shared between the weights row
    * and the resample row so the two oracles can never drift.
    */
  private def dsirSqlCtes: String =
    s"""tokall AS (SELECT doc_id, lang, unnest(string_split(text, ' '))
       |             AS w
       |           FROM documents),
       |vocab AS (SELECT DISTINCT w FROM tokall),
       |items AS (SELECT w AS doc_id, 0 AS i, w AS t FROM vocab),
       |${graft.functions.OracleSql.fnvFold("items")},
       |vb AS (SELECT doc_id AS w, CAST(h % 64 AS BIGINT) AS b FROM done),
       |tk AS (SELECT t.doc_id, t.lang, vb.b FROM tokall t
       |       JOIN vb USING (w)),
       |tgt AS (SELECT b, count(*) AS ct FROM tk WHERE lang = 'en'
       |        GROUP BY b),
       |rawc AS (SELECT b, count(*) AS cr FROM tk GROUP BY b),
       |tot AS (SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
       |            AS BIGINT) AS t_n,
       |          CAST(count(*) AS BIGINT) AS r_n FROM tk),
       |lr AS (
       |  SELECT rawc.b,
       |    ln(CAST((coalesce(ct, 0) + 1) * (r_n + 64) AS DOUBLE)
       |       / CAST((cr + 1) * (t_n + 64) AS DOUBLE)) AS lr
       |  FROM rawc LEFT JOIN tgt USING (b) CROSS JOIN tot),
       |wts AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |    round(${graft.util.Stable.dsumSql("lr", 6)}, 4) AS dsir_weight
       |  FROM tk JOIN lr USING (b)
       |  GROUP BY doc_id)""".stripMargin

  private val dsir = Q(
    "t_dsir_weights",
    dsirWeights,
    Some(s"""WITH RECURSIVE
            |$dsirSqlCtes
            |SELECT doc_id, n_tok, dsir_weight FROM wts""".stripMargin),
  )

  /** The RESAMPLING half of DSIR: keep the top-N documents by importance
    * weight (deterministic rank with doc_id tiebreak — the
    * Gumbel-noise variant of the paper is a seeded-RNG concern, same
    * category as P7). TakeOrderedAndProject, so each partition
    * contributes an N-row heap and no global sort ever runs.
    */
  private val dsirResample = Q(
    "t_dsir_resample",
    (s, d) =>
      dsirWeights(s, d)
        .orderBy(desc("dsir_weight"), asc("doc_id")).limit(50)
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("dsir_weight"), asc("doc_id"))))
        .select("doc_id", "dsir_weight", "rank"),
    Some(s"""WITH RECURSIVE
            |$dsirSqlCtes
            |SELECT doc_id, dsir_weight,
            |  CAST(row_number() OVER (ORDER BY dsir_weight DESC, doc_id)
            |    AS INT) AS rank
            |FROM wts
            |ORDER BY dsir_weight DESC, doc_id
            |LIMIT 50""".stripMargin),
  )

  /** Systematic weighted sampling: select documents with inclusion
    * probability ∝ weight (here n_chars — the "sample docs proportional
    * to token count" step a fixed-token-budget training mix needs),
    * WITHOUT any RNG: lay documents on a line at their cumulative
    * weight, select every document whose interval (cum−w, cum] covers a
    * multiple of the stride. Exactly ⌊total/stride⌋ hits overall,
    * long docs can be hit multiple times (multiplicity kept — that IS
    * systematic sampling's semantics for w > stride).
    *
    * The global cumulative sum never global-sorts: per-shard running
    * sums (parallel windows) + a broadcast ≤|shards|-row offset join —
    * the same sharded-prefix-sum shape the sequence packer uses, made
    * GLOBAL by composing shard offsets. Everything is BIGINT, so both
    * engines place every boundary identically.
    */
  private val systematic = Q(
    "t_weighted_systematic_sample",
    (s, d) => {
      val stride = 8192L
      val nShards = 16
      val base = Tables(s, d).documents
        .select(col("doc_id"), col("n_chars").as("w"))
        .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      val wloc = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = base.withColumn("cum_local", sum(col("w")).over(wloc))
      val offs = base.groupBy("shard").agg(sum(col("w")).as("tot"))
        .withColumn("offset",
          coalesce(sum(col("tot")).over(
            Window.orderBy("shard")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("shard", "offset")
      local.join(broadcast(offs), "shard")
        .withColumn("cum", col("offset") + col("cum_local"))
        // integer division (all operands nonnegative BIGINT): no float
        // boundary placement anywhere
        .withColumn("n_hits",
          expr(s"cum div ${stride}L - (cum - w) div ${stride}L"))
        .filter(col("n_hits") > 0)
        .select("doc_id", "w", "cum", "n_hits")
    },
    Some(
      """WITH base AS (
        |  SELECT doc_id, n_chars AS w, doc_id % 16 AS shard
        |  FROM documents),
        |loc AS (
        |  SELECT doc_id, w, shard,
        |    CAST(sum(w) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_local
        |  FROM base),
        |offs AS (
        |  SELECT shard,
        |    CAST(coalesce(sum(tot) OVER (ORDER BY shard
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS offset
        |  FROM (SELECT shard, sum(w) AS tot FROM base GROUP BY 1))
        |SELECT doc_id, w, cum, n_hits FROM (
        |  SELECT l.doc_id, l.w, l.cum_local + o.offset AS cum,
        |    CAST((l.cum_local + o.offset) // 8192
        |      - (l.cum_local + o.offset - l.w) // 8192
        |    AS BIGINT) AS n_hits
        |  FROM loc l JOIN offs o USING (shard))
        |WHERE n_hits > 0""".stripMargin),
  )

  /** Temperature-scaled mixture resampling (the multilingual/domain
    * α-sampling every large LM pipeline runs — p_s^α re-balancing with
    * α = 0.5): target share of source s ∝ √n_s, so rare sources are
    * UPsampled (rate > 1 ⇒ deterministic duplication) and dominant ones
    * down-sampled, at constant total corpus size.
    *
    * Everything is RNG-free and engine-exact: α = 0.5 is `sqrt` (IEEE
    * correctly-rounded in both engines — `pow` is NOT and would flip
    * threshold compares), rates are chains of exact IEEE divisions, a
    * doc's copy count is floor(rate) plus one more iff its md5 prefix
    * clears the fractional rate (the [[graft.operators.SourcesSinks
    * .deterministicSample]] compare, same %08x formatting both sides).
    * Scale: one broadcast join of per-source rates + a bounded explode;
    * membership is a pure function of the key, so the sample is stable
    * across partitioning, retries, and engines — and replays in SQL.
    */
  private val temperature = Q(
    "t_temperature_mixture",
    (s, d) => {
      val docs = Tables(s, d).documents
      val perSource = docs.groupBy("source")
        .agg(count(lit(1)).cast("double").as("n_s"))
      val tot = perSource.agg(
        sum(sqrt(col("n_s"))).as("sum_sqrt"),
        sum(col("n_s")).as("n"))
      val rates = perSource.crossJoin(broadcast(tot))
        .select(col("source"),
          (sqrt(col("n_s")) / col("sum_sqrt") * col("n") / col("n_s"))
            .as("rate"))
      val base = floor(col("rate")).cast("long")
      val frac = col("rate") - floor(col("rate"))
      val thr = format_string("%08x",
        floor(frac * lit(4294967296.0)).cast("long"))
      val copies = (base + when(
        substring(md5(col("doc_id").cast("string")), 1, 8) < thr, 1L)
        .otherwise(0L)).as("copies")
      docs.join(broadcast(rates), "source")
        .select(col("doc_id"), col("source"), copies)
        .filter(col("copies") > 0)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1L), col("copies"))).as("copy_idx"))
    },
    Some(
      """WITH ns AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n_s
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT sum(sqrt(n_s)) AS sum_sqrt, sum(n_s) AS n FROM ns),
        |rates AS (
        |  SELECT source, sqrt(n_s) / sum_sqrt * n / n_s AS rate
        |  FROM ns CROSS JOIN tot),
        |cp AS (
        |  SELECT d.doc_id, d.source,
        |    CAST(floor(r.rate) AS BIGINT) +
        |    CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
        |      printf('%08x', CAST(floor((r.rate - floor(r.rate))
        |        * 4294967296.0) AS BIGINT))
        |    THEN 1 ELSE 0 END AS copies
        |  FROM documents d JOIN rates r USING (source))
        |SELECT doc_id, source,
        |  CAST(unnest(range(1, copies + 1)) AS BIGINT) AS copy_idx
        |FROM cp WHERE copies > 0""".stripMargin),
  )

  def all: Seq[Q] =
    Seq(split, batches, batchesSharded, decontaminate, incremental, packing,
      mixture, crossdoc, chunk, logprob, pplBuckets, dedupSpans, shuffle,
      stratified, chunkDedup, pipeline, dsir, dsirResample, systematic,
      temperature)
}
