package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document TF-IDF key terms — the classic document summarisation /
  * keyword extraction primitive (the domain layer's
  * `dom_surface_forms_tfidf` applies the same weighting to a curated
  * phrase vocabulary; this is the corpus-generic form over raw tokens):
  * score(w, d) = tf · ln(N/df), top-[[TopK]] terms per document.
  *
  * Exactness: tf, df, N are BIGINTs; the idf is ln of ONE IEEE
  * division of exact integers and the score one multiplication — the
  * same fixed-op-sequence recipe as `t_unigram_logprob` (green since
  * round 3), rounded to 4 dp BEFORE ranking so the rank window orders
  * identical values in both engines, ties broken by term.
  *
  * Scale: a (doc, term) hash agg, a vocabulary-sized df agg, a 1-row
  * broadcast, and a per-doc rank window over that doc's DISTINCT terms
  * only. The df join is vocabulary-keyed (shuffle, deliberately not
  * broadcast: a web-scale vocabulary exceeds broadcast limits — the
  * lesson of the t_unigram vocab cap).
  */
object TfIdfTerms {

  val TopK = 5

  private val q = Q(
    "t_tfidf_terms",
    (s, d) => {
      val docs = Tables(s, d).documents
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id")
        .orderBy(desc("score"), asc("term"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf").cast("double") *
            log(col("n").cast("double") / col("df").cast("double")), 4))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    },
    Some(
      s"""WITH tf AS (
         |  SELECT doc_id, w AS term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM documents)
         |  GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
         |    CAST(dfreq.df AS BIGINT) AS df,
         |    round(CAST(tf.tf AS DOUBLE) *
         |      ln(CAST(n.n AS DOUBLE) / CAST(dfreq.df AS DOUBLE)), 4)
         |      AS score
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
         |SELECT doc_id, term, tf, df, score, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, term ASC) AS INT) AS rank
         |  FROM scored)
         |WHERE rank <= $TopK""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
