package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
  * Lafferty) — the language-modelling ranking function beside BM25's
  * probabilistic one; the pair are the two classical lexical
  * baselines every retrieval stack reports:
  *
  *   score(q,d) = Σ_{t∈q} ln( (tf_{t,d} + μ·p(t|C)) / (|d| + μ) )
  *
  * with p(t|C) = (cf_t + 1)/(|C| + 1) (add-one keeps out-of-corpus
  * query terms finite) and μ = 2000. Like t_bm25_topk: ONE stats
  * aggregate (corpus length + one collection frequency per term)
  * broadcast into the scoring scan, per-term tf bound to a column
  * once, ranking via TakeOrderedAndProject with a 4-dp round +
  * doc_id tiebreak for cross-engine stability. Scores are negative
  * log-probabilities — no positivity filter, every document ranks.
  */
object QueryLikelihood {

  val Mu = 2000.0

  def topK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val words = split(col("text"), " ")
    val base = docs
      .select(col("doc_id"), words.as("w"),
        size(words).cast("double").as("dl"))

    def tf(term: String): Column =
      size(filter(col("w"), x => x === term)).cast("double")

    val cfCols = terms.indices.map(i =>
      sum(tf(terms(i))).as(s"cf$i"))
    val stats = base.agg(
      sum(col("dl")).cast("double").as("clen"), cfCols: _*)

    val scored = base
      .crossJoin(broadcast(stats))
      .select(col("doc_id") +: col("dl") +: col("clen") +:
        terms.indices.map(i => col(s"cf$i")) ++:
        terms.zipWithIndex.map { case (t, i) => tf(t).as(s"tf$i") }: _*)

    val score = terms.indices.map { i =>
      val p = (col(s"cf$i") + lit(1.0)) / (col("clen") + lit(1.0))
      log((col(s"tf$i") + lit(Mu) * p) / (col("dl") + lit(Mu)))
    }.reduce(_ + _)

    scored
      .withColumn("score", round(score, 4))
      .select(col("doc_id"), col("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("score"), asc("doc_id"))))
  }

  private def oracleSql(terms: Seq[String], k: Int): String = {
    val cfs = terms.zipWithIndex.map { case (t, i) =>
      s"""CAST(sum(len(list_filter(w, x -> x = '$t'))) AS DOUBLE)
         |      AS cf$i""".stripMargin
    }.mkString(",\n    ")
    val score = terms.indices.map { i =>
      val t = terms(i)
      s"""ln((CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE)
         |   + CAST($Mu AS DOUBLE) * ((cf$i + 1.0) / (clen + 1.0)))
         |  / (dl + CAST($Mu AS DOUBLE)))""".stripMargin
    }.mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS w,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT CAST(sum(dl) AS DOUBLE) AS clen,
       |    $cfs
       |  FROM tok)
       |SELECT doc_id, score, rank FROM (
       |  SELECT doc_id, round($score, 4) AS score,
       |    CAST(row_number() OVER (ORDER BY round($score, 4) DESC,
       |      doc_id ASC) AS INT) AS rank
       |  FROM tok CROSS JOIN stats)
       |WHERE rank <= $k""".stripMargin
  }

  private val q = Q(
    "t_ql_dirichlet_topk",
    (s, d) => topK(Tables(s, d).documents, Seq("spark", "join"), 20),
    Some(oracleSql(Seq("spark", "join"), 20)),
  )

  def queries: Seq[Q] = Seq(q)
}
