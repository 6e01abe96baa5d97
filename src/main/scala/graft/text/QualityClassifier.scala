package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Linear classifier over hashed word n-grams — fastText's architecture
  * (Joulin et al. 2016) and the shape of the model-based quality filters
  * in CCNet/GPT-3-style curation: score(doc) = Σ_features w(h(f)) over
  * unigram + bigram features, keep iff score ≥ 0. The weight table here
  * is derived from the feature hash itself (w = (fmix64∘fnv1a("qc:"+f)
  * & 2047) − 1024, the same weights-ARE-a-hash-function trick as the JL
  * random projection) so the gate pins the full feature-extraction +
  * scoring plan end to end; a production deployment swaps in trained
  * coefficients either inline (weights quantized into a hash-indexed
  * array literal) or as a broadcast join on the feature hash — the plan
  * shape is identical.
  *
  * Scale: bigram construction is per-row array algebra (zip_with, zero
  * shuffle), scoring is a pure map, and the only exchange is the final
  * doc-keyed aggregate — map-side combinable, so classifier application
  * is a single linear pass however large the corpus. All arithmetic is
  * BIGINT (power-of-two mask ⇒ signed & and unsigned % agree; no
  * integer division, whose floor/truncate semantics differ between
  * engines on negatives).
  */
object QualityClassifier {

  private def features(text: org.apache.spark.sql.Column) = {
    val toks = split(text, " ")
    val bigrams = filter(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      f => f.isNotNull)
    concat(toks, bigrams)
  }

  private val q = Q(
    "t_quality_classifier",
    (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"), explode(features(col("text"))).as("f"))
        .withColumn("w",
          graft.functions.TextSketches.hll_hash(concat(lit("qc:"), col("f")))
            .bitwiseAND(lit(2047L)) - 1024L)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feat"), sum(col("w")).as("score"))
        .withColumn("keep", col("score") >= 0),
    Some(
      s"""WITH RECURSIVE
         |dd AS (SELECT doc_id, string_split(text, ' ') AS w
         |       FROM documents),
         |feats AS (
         |  SELECT doc_id, unnest(w) AS f FROM dd
         |  UNION ALL
         |  SELECT doc_id, unnest(list_transform(range(len(w) - 1),
         |    i -> w[i+1] || ' ' || w[i+2])) AS f FROM dd),
         |vocab AS (SELECT DISTINCT f FROM feats),
         |items AS (SELECT f AS doc_id, 0 AS i, 'qc:' || f AS t
         |          FROM vocab),
         |${graft.functions.OracleSql.fnvFold("items")},
         |${graft.functions.OracleSql.fmix64},
         |wt AS (SELECT doc_id AS f, CAST(u % 2048 AS BIGINT) - 1024 AS w
         |       FROM mixed)
         |SELECT feats.doc_id, count(*) AS n_feat,
         |  CAST(sum(wt.w) AS BIGINT) AS score,
         |  CAST(sum(wt.w) AS BIGINT) >= 0 AS keep
         |FROM feats JOIN wt USING (f)
         |GROUP BY feats.doc_id""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
