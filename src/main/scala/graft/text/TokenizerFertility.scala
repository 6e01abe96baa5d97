package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Tokenizer fertility by language — the tokenizer-evaluation staple
  * (how many subword tokens per word, how many characters per token)
  * that decides whether a tokenizer is fair across the corpus's
  * languages: high fertility = that language pays more sequence
  * length for the same text.
  *
  * Uses the engine's two standing token definitions (t_token_count's
  * whitespace words and BPE-ish runs) so the ratios compose with the
  * rest of the text family. EXACT: per-language BIGINT sums from ONE
  * corpus aggregate; each published ratio is a single IEEE divide,
  * rounded.
  */
object TokenizerFertility {

  private val q = Q(
    "t_tokenizer_fertility",
    (s, d) => {
      val ws = size(split(col("text"), " ")).cast("long")
      val bpe = regexp_count(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")
      Tables(s, d).documents
        .select(col("lang"), col("n_chars"), ws.as("ws"), bpe.as("bpe"))
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"),
          sum(col("ws")).as("words"), sum(col("bpe")).as("toks"))
        .select(col("lang"), col("docs"), col("chars"), col("words"),
          col("toks"),
          round(col("toks").cast("double") /
            col("words").cast("double"), 6).as("fertility"),
          round(col("chars").cast("double") /
            col("toks").cast("double"), 6).as("chars_per_tok"))
        .orderBy("lang")
    },
    Some(
      """SELECT lang, count(*) AS docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS words,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS toks,
        |  round(CAST(sum(len(regexp_extract_all(text,
        |      '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS DOUBLE)
        |    / CAST(sum(len(string_split(text, ' '))) AS DOUBLE), 6)
        |    AS fertility,
        |  round(CAST(sum(n_chars) AS DOUBLE)
        |    / CAST(sum(len(regexp_extract_all(text,
        |      '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS DOUBLE), 6)
        |    AS chars_per_tok
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
