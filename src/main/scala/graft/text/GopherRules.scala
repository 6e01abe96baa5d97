package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Gopher quality-rule battery (Rae et al. 2021, "Scaling Language
  * Models: ...", table A1 — the public heuristic set most large-corpus
  * curations start from; FineWeb/Dolma reuse it nearly verbatim). Each
  * rule is a per-document flag; `passes` is their conjunction. Beside
  * the single-signal rows (`t_quality_score`, `t_repetition_filter`)
  * this is the COMPOSITE gate a pipeline actually ships.
  *
  * Exactness discipline: every ratio threshold is evaluated in integer
  * cross-multiplied form (10·symbols ≤ words, 5·alpha_words ≥ 4·words)
  * so the flags replay bit-exactly in DuckDB with no float division.
  * Map-only: one projection over the scan, zero shuffle; at 100 TB this
  * runs at scan speed and the flags prune before any expensive stage.
  */
object GopherRules {

  val MinWords = 50
  val MaxWords = 100000

  /** Gopher's "required words" probe: a doc with fewer than 2 of these
    * is unlikely to be natural prose.
    */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def words(c: Column): Column = split(c, " ")

  /** All rule flags over a text column; shared by query and tests. */
  def flags(text: Column): Seq[(String, Column)] = {
    val w = words(text)
    val nWords = size(w)
    val totalLen = aggregate(w, lit(0),
      (acc, x) => acc + length(x))
    val alphaWords = size(filter(w, x => x.rlike("[a-zA-Z]")))
    val hashes = size(split(text, "#", -1)) - 1
    val ellipses = size(split(text, "\\.\\.\\.", -1)) - 1
    val stopHits = RequiredStopwords
      .map(sw => when(array_contains(w, sw), 1).otherwise(0))
      .reduce(_ + _)
    Seq(
      "ok_word_count" ->
        (nWords >= MinWords && nWords <= MaxWords),
      // 3 ≤ mean word length ≤ 10, cross-multiplied
      "ok_mean_word_len" ->
        (totalLen >= nWords * 3 && totalLen <= nWords * 10),
      // symbol-to-word ratio (# and ...) ≤ 0.1
      "ok_symbol_ratio" ->
        ((hashes + ellipses) * 10 <= nWords),
      // ≥ 80% of words carry an alphabetic character
      "ok_alpha_words" ->
        (alphaWords * 5 >= nWords * 4),
      // ≥ 2 of the required stopwords present
      "ok_stopwords" -> (stopHits >= 2),
    )
  }

  /** The same flags as DuckDB SQL over `x` (a text expression). */
  def flagsSql(x: String): Seq[(String, String)] = {
    val w = s"string_split($x, ' ')"
    val nWords = s"len($w)"
    val totalLen = s"list_sum(list_transform($w, t -> length(t)))"
    val alphaWords = s"len(list_filter($w, t -> regexp_matches(t, '[a-zA-Z]')))"
    val hashes = s"(len(string_split($x, '#')) - 1)"
    val ellipses = s"(len(string_split($x, '...')) - 1)"
    val stopHits = RequiredStopwords
      .map(sw => s"CASE WHEN list_contains($w, '$sw') THEN 1 ELSE 0 END")
      .mkString(" + ")
    Seq(
      "ok_word_count" ->
        s"($nWords >= $MinWords AND $nWords <= $MaxWords)",
      "ok_mean_word_len" ->
        s"(coalesce($totalLen, 0) >= $nWords * 3 AND coalesce($totalLen, 0) <= $nWords * 10)",
      "ok_symbol_ratio" ->
        s"(($hashes + $ellipses) * 10 <= $nWords)",
      "ok_alpha_words" ->
        s"($alphaWords * 5 >= $nWords * 4)",
      "ok_stopwords" -> s"(($stopHits) >= 2)",
    )
  }

  private val q = Q(
    "t_gopher_rules",
    (s, d) => {
      val fs = flags(col("text"))
      val passes = fs.map(_._2).reduce(_ && _)
      Tables(s, d).documents.select(
        col("doc_id") +: fs.map { case (n, c) => c.as(n) } :+
          passes.as("passes"): _*)
    },
    Some {
      val fs = flagsSql("text")
      val cols = fs.map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")
      val passes = fs.map(_._2).mkString(" AND ")
      s"""SELECT doc_id,
         |  $cols,
         |  ($passes) AS passes
         |FROM documents""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
