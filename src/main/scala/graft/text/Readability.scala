package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Flesch reading-ease per document — the classic readability quality
  * signal (Flesch 1948; CCNet-style corpus filters bucket on exactly
  * this family): 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
  * words). Counts are exact integers from one codegen-friendly
  * projection — sentences = terminator runs, words = whitespace
  * tokens, syllables = vowel groups (the standard heuristic; a
  * dictionary syllabifier would swap in behind the same counts) — and
  * the score is a fixed IEEE chain over those integers, so both
  * engines agree bit-for-bit after a 4-dp round. Map-only: no shuffle,
  * no state, scales as a pure scan.
  */
object Readability {

  private val q = Q(
    "t_readability",
    (s, d) => {
      val docs = Tables(s, d).documents
      val words = size(split(trim(col("text")), "\\s+"))
      // sentence terminators: runs of . ! ? count once; a doc with no
      // terminator is one sentence
      val sentences = greatest(
        size(split(col("text"), "[.!?]+")) - 1, lit(1))
      // vowel groups per word, summed over the doc; every word counts
      // at least one syllable
      val vowelGroups = size(split(lower(col("text")), "[aeiouy]+")) - 1
      docs.select(col("doc_id"),
          words.cast("long").as("n_words"),
          sentences.cast("long").as("n_sentences"),
          greatest(vowelGroups, words).cast("long").as("n_syllables"))
        .filter(col("n_words") > 0)
        .withColumn("flesch",
          round(lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) -
            lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double")), 4))
    },
    Some(
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_words,
        |    CAST(greatest(len(string_split_regex(text, '[.!?]+')) - 1, 1)
        |      AS BIGINT) AS n_sentences,
        |    CAST(len(string_split_regex(lower(text), '[aeiouy]+')) - 1
        |      AS BIGINT) AS raw_syl
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences,
        |  greatest(raw_syl, n_words) AS n_syllables,
        |  round(206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE)
        |               / CAST(n_sentences AS DOUBLE))
        |    - 84.6 * (CAST(greatest(raw_syl, n_words) AS DOUBLE)
        |              / CAST(n_words AS DOUBLE)), 4) AS flesch
        |FROM c WHERE n_words > 0""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
