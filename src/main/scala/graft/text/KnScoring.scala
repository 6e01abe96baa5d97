package graft.text

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._

/** Per-document cross-entropy under the corpus Kneser–Ney bigram model
  * — the model-based quality scorer `t_perplexity_buckets` approximates
  * with unigrams, upgraded to the `t_kneserney_bigrams` model: a
  * document whose bigrams are improbable under the corpus LM is
  * boilerplate, gibberish, or off-domain, and ranks for removal or
  * down-weighting.
  *
  * Scoring is IN-VOCABULARY by design: bigrams absent from the
  * (count ≥ 5) model table contribute to a `coverage_ppm` column
  * instead of a smoothed tail estimate — coverage is itself a quality
  * signal (low coverage = unusual text), and it keeps the score free of
  * a backoff constant that would dominate exactly the documents the
  * filter most needs to rank.
  *
  * Determinism: model probabilities are the 6-dp-rounded exact
  * rationals both engines already agree on; each scored term
  * m·log2(p) is computed on those IDENTICAL doubles and the cross-doc
  * sum goes through the decimal-stable path (the `t_char_entropy` log
  * discipline). Scale: model table is vocabulary-bounded (broadcast);
  * scoring is one explode + one doc-keyed aggregate over the corpus.
  */
object KnScoring {

  private val crossEntropy = Q(
    "t_kn_crossentropy",
    (s, d) => {
      val docs = Tables(s, d).documents
      val words = split(col("text"), " ")
      val docBigrams = docs
        .select(col("doc_id"), explode(
          zip_with(
            slice(words, lit(1), size(words) - 1),
            slice(words, lit(2), size(words) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
      // the t_kneserney_bigrams model, identically derived
      val toks = docBigrams // corpus bigram counts reuse the same explode
        .groupBy("w1", "w2").agg(sum(col("m")).as("c12"))
      val left = toks.groupBy("w1").agg(sum(col("c12")).as("c1"),
        count(lit(1)).as("n_left"))
      val right = toks.groupBy("w2").agg(count(lit(1)).as("n_right"))
      val types = toks.agg(count(lit(1)).as("t_types"))
      val model = toks.filter(col("c12") >= 5)
        .join(broadcast(left), "w1")
        .join(broadcast(right), "w2")
        .crossJoin(broadcast(types))
        .select(col("w1"), col("w2"),
          round((greatest(lit(4L) * col("c12") - 3L, lit(0L)) *
            col("t_types") + lit(3L) * col("n_left") * col("n_right"))
            .cast("double") /
            (lit(4L) * col("c1") * col("t_types")).cast("double"), 6)
            .as("p_kn"))
      // every document gets a row — a bigram-less doc is a scoring
      // RESULT (n_bigrams 0, NULL score), not a dropped record
      val totals = docs.select(col("doc_id"))
        .join(docBigrams.groupBy("doc_id")
          .agg(sum(col("m")).as("n_bigrams")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
      val scored = docBigrams
        .join(broadcast(model), Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(sum(col("m")).as("n_scored"),
          Stable.dsum(col("m").cast("double") * log2(col("p_kn")), 9)
            .as("logsum"))
      totals.join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bigrams"),
          coalesce(col("n_scored"), lit(0L)).as("n_scored"),
          when(col("n_bigrams") > 0,
            expr("1000000 * coalesce(n_scored, 0L) div n_bigrams"))
            .as("coverage_ppm"),
          when(col("n_scored") > 0,
            -col("logsum") / col("n_scored").cast("double"))
            .as("cross_entropy"))
    },
    Some(
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |bg AS (
        |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM w)),
        |db AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS m
        |       FROM bg GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, CAST(sum(m) AS BIGINT) AS c12
        |        FROM db GROUP BY 1, 2),
        |lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |          CAST(count(*) AS BIGINT) AS n_left
        |        FROM c12 GROUP BY 1),
        |rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_right
        |        FROM c12 GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM c12),
        |model AS (
        |  SELECT c12.w1, c12.w2,
        |    round(CAST(greatest(4 * c12.c12 - 3, 0) * tt.t_types
        |        + 3 * lft.n_left * rgt.n_right AS DOUBLE)
        |      / CAST(4 * lft.c1 * tt.t_types AS DOUBLE), 6) AS p_kn
        |  FROM c12 JOIN lft ON c12.w1 = lft.w1
        |           JOIN rgt ON c12.w2 = rgt.w2
        |           CROSS JOIN tt
        |  WHERE c12.c12 >= 5),
        |tot AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(s.n, 0) AS BIGINT) AS n_bigrams
        |  FROM documents d LEFT JOIN
        |    (SELECT doc_id, sum(m) AS n FROM db GROUP BY 1) s
        |    ON d.doc_id = s.doc_id),
        |sc AS (
        |  SELECT db.doc_id, CAST(sum(db.m) AS BIGINT) AS n_scored,
        |    CAST(sum(CAST(CAST(db.m AS DOUBLE) * log2(model.p_kn)
        |      AS DECIMAL(30,9))) AS DOUBLE) AS logsum
        |  FROM db JOIN model ON db.w1 = model.w1 AND db.w2 = model.w2
        |  GROUP BY 1)
        |SELECT t.doc_id, t.n_bigrams,
        |  coalesce(sc.n_scored, 0) AS n_scored,
        |  CASE WHEN t.n_bigrams > 0
        |       THEN 1000000 * coalesce(sc.n_scored, 0) // t.n_bigrams END
        |    AS coverage_ppm,
        |  CASE WHEN sc.n_scored > 0
        |       THEN -sc.logsum / CAST(sc.n_scored AS DOUBLE) END
        |    AS cross_entropy
        |FROM tot t LEFT JOIN sc ON t.doc_id = sc.doc_id""".stripMargin),
  )

  def queries: Seq[Q] = Seq(crossEntropy)
}
