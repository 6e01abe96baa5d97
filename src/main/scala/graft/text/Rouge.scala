package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ROUGE-2 overlap scoring against a benchmark set — the GRADED
  * decontamination audit beside [[graft.operators.Curation]]'s exact
  * 5-gram containment gate (`d_decontaminate`): exact containment
  * catches verbatim leaks, but a training-corpus audit also wants the
  * near-verbatim tail (paraphrased eval questions, reformatted
  * passages), which is exactly what ROUGE-N recall over the BENCHMARK
  * side measures (Lin 2004: recall = |bigrams(cand) ∩ bigrams(bench)| /
  * |bigrams(bench)|).
  *
  * Scale posture: the benchmark set is small by definition (eval suites
  * are thousands of documents, the corpus is billions), so its exploded
  * bigram index is BROADCAST and the whole audit is one map-side join
  * over the candidate bigram scan + one bounded aggregate per surviving
  * (candidate, benchmark) pair — the corpus never shuffles. Scores are
  * emitted as the exact integer triple (overlap, bench_n, doc_n) plus
  * one rounded IEEE division each, so the gate hashes integers and two
  * deterministic floats.
  */
object Rouge {

  /** Benchmark membership: doc_id ≡ 0 (mod 97) — a deterministic ~1%
    * slice standing in for the held-out eval suite.
    */
  val BenchMod = 97L

  /** Report pairs with recall ≥ this floor (below it the overlap is
    * stop-bigram noise, and emitting the full |corpus|×|bench| zero
    * matrix would defeat the point of the audit).
    */
  val MinRecall = 0.05

  def rouge2Pairs(docs: DataFrame): DataFrame = {
    val grams = docs.select(col("doc_id"),
      array_distinct(graft.dedup.MinHashDedup.shingles(col("text"), 2))
        .as("grams"))
    val bench = grams.filter(col("doc_id") % BenchMod === 0)
      .select(col("doc_id").as("bench_id"),
        size(col("grams")).as("bench_n"), explode(col("grams")).as("g"))
    val cand = grams.filter(col("doc_id") % BenchMod =!= 0)
      .select(col("doc_id"), size(col("grams")).as("doc_n"),
        explode(col("grams")).as("g"))
    cand.join(broadcast(bench), "g")
      .groupBy("doc_id", "bench_id", "doc_n", "bench_n")
      .agg(count(lit(1)).as("overlap"))
      .withColumn("rouge2_recall",
        round(col("overlap").cast("double") / col("bench_n"), 4))
      .withColumn("rouge2_precision",
        round(col("overlap").cast("double") / col("doc_n"), 4))
      .filter(col("rouge2_recall") >= MinRecall)
      .select(col("doc_id"), col("bench_id"), col("overlap"),
        col("bench_n"), col("doc_n"), col("rouge2_recall"),
        col("rouge2_precision"))
  }

  private val q = Q(
    "t_rouge_decontaminate",
    (s, d) => rouge2Pairs(Tables(s, d).documents),
    Some(
      s"""WITH g AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(
         |      range(1, greatest(len(string_split(text,' ')) - 1, 1) + 1),
         |      i -> concat_ws(' ', string_split(text,' ')[i],
         |                          string_split(text,' ')[i+1]))) AS grams
         |  FROM documents),
         |bench AS (
         |  SELECT doc_id AS bench_id, len(grams) AS bench_n,
         |    unnest(grams) AS gr
         |  FROM g WHERE doc_id % $BenchMod = 0),
         |cand AS (
         |  SELECT doc_id, len(grams) AS doc_n, unnest(grams) AS gr
         |  FROM g WHERE doc_id % $BenchMod <> 0),
         |ov AS (
         |  SELECT c.doc_id, b.bench_id, c.doc_n, b.bench_n,
         |    count(*) AS overlap
         |  FROM cand c JOIN bench b ON c.gr = b.gr
         |  GROUP BY 1, 2, 3, 4)
         |SELECT doc_id, bench_id, CAST(overlap AS BIGINT) AS overlap,
         |  CAST(bench_n AS BIGINT) AS bench_n,
         |  CAST(doc_n AS BIGINT) AS doc_n,
         |  round(CAST(overlap AS DOUBLE) / bench_n, 4) AS rouge2_recall,
         |  round(CAST(overlap AS DOUBLE) / doc_n, 4) AS rouge2_precision
         |FROM ov
         |WHERE round(CAST(overlap AS DOUBLE) / bench_n, 4) >= $MinRecall""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
