package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 retrieval scoring (Robertson–Spärck Jones, the BM25+idf form
  * used by Lucene): corpus statistics (df, avg length) + per-document
  * term frequencies → ranked results for a query term set.
  *
  * Shape at scale: df and avgdl are two tiny aggregates (broadcast);
  * scoring is a map stage over the corpus; ranking is
  * TakeOrderedAndProject. Nothing quadratic, one scan.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** Top-k docs for `terms`, scored with BM25 over whitespace tokens.
    * Scores are rounded to 4 dp before ranking (with doc_id tiebreak) so
    * results are stable across engines.
    */
  def topK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val words = split(col("text"), " ")
    val base = docs.select(col("doc_id"), words.as("w"), size(words).as("dl"))

    val n = base.count().toDouble
    val avgdl = base.agg(sum(col("dl"))).head().getLong(0).toDouble / n

    def tf(term: String): Column =
      size(filter(col("w"), x => x === term)).cast("double")

    val score = terms.map { t =>
      val tfc = tf(t)
      // df per term via a scalar subquery-free two-pass: compute inline
      // from the corpus as a literal (tiny, one aggregate per term)
      val df = base.filter(array_contains(col("w"), t)).count().toDouble
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      lit(idf) * tfc * (K1 + 1) /
        (tfc + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / avgdl))
    }.reduce(_ + _)

    base
      .withColumn("score", round(score, 4))
      .filter(col("score") > 0)
      .select(col("doc_id"), col("score"))
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("score"), asc("doc_id"))))
      .filter(col("rank") <= k)
  }

  private def oracleSql(terms: Seq[String], k: Int): String = {
    val termScores = terms.map { t =>
      s"""(ln(1.0 + (stats.n - (SELECT CAST(count(*) AS DOUBLE) FROM tok
         |      WHERE list_contains(w, '$t')) + 0.5) /
         |     ((SELECT CAST(count(*) AS DOUBLE) FROM tok
         |      WHERE list_contains(w, '$t')) + 0.5))
         |  * len(list_filter(w, x -> x = '$t')) * 2.2
         |  / (len(list_filter(w, x -> x = '$t'))
         |     + 1.2 * (1 - 0.75 + 0.75 * dl / stats.avgdl)))""".stripMargin
    }.mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS w,
       |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM tok)
       |SELECT doc_id, score, rank FROM (
       |  SELECT doc_id, round($termScores, 4) AS score,
       |    CAST(row_number() OVER (ORDER BY round($termScores, 4) DESC,
       |      doc_id ASC) AS INT) AS rank
       |  FROM tok CROSS JOIN stats
       |  WHERE round($termScores, 4) > 0)
       |WHERE rank <= $k""".stripMargin
  }

  private val q = Q(
    "t_bm25_topk",
    (s, d) => topK(Tables(s, d).documents, Seq("spark", "join"), 20),
    Some(oracleSql(Seq("spark", "join"), 20)),
  )

  def queries: Seq[Q] = Seq(q)
}
