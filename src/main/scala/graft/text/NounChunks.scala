package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** POS-pattern-lite noun chunking — narrowing the reference's spaCy
  * `doc.noun_chunks` dependency (skills_detection_utils.py:124-138)
  * further than the word-bigram stand-in: a base noun phrase is
  * approximated as a maximal run of content tokens between CLOSED-CLASS
  * boundary words (determiners, prepositions, conjunctions, pronouns,
  * auxiliaries, common light verbs). Closed-class words are a finite,
  * public inventory — the part of POS tagging that needs no model —
  * and in noun-phrase-dense text (job descriptions, skill labels) the
  * tokens between them are overwhelmingly the adjective+noun material
  * spaCy chunks emit.
  *
  * Deliberately NOT attempted without a model: distinguishing open-class
  * verbs from nouns ("marketing manager" vs "marketing products") —
  * suffix heuristics were rejected because domain nouns share them
  * (engineering, marketing, experienced). The chunker over-captures
  * those runs; the surface-form pipeline's tf-idf representativity mask
  * downstream is exactly the filter that absorbs that over-capture (it
  * exists in the reference for the same reason — spaCy over-captures
  * too).
  *
  * Execution shape: ONE regexp_replace + split inside the scan — fully
  * codegen'd, map-only, zero shuffle, and expressible identically in
  * DuckDB (shared pattern constant), so every consumer keeps a
  * hash-exact oracle.
  */
object NounChunks {

  /** Closed-class boundary inventory (public function-word lists) plus
    * the light verbs that dominate job-ad prose. Lowercase; applied to
    * already-cleaned (lowercase alnum) text.
    */
  val BoundaryWords: Seq[String] = Seq(
    // determiners / quantifiers
    "the", "a", "an", "this", "that", "these", "those", "each", "every",
    "some", "any", "no", "all", "both", "either", "neither", "another",
    "such", "more", "most", "many", "much", "few", "several", "other",
    // conjunctions / complementisers
    "and", "or", "but", "nor", "so", "yet", "if", "because", "while",
    "when", "where", "than", "then", "although", "though", "whether",
    // prepositions
    "of", "in", "on", "at", "by", "for", "with", "to", "from", "as",
    "into", "through", "over", "under", "between", "during", "before",
    "after", "about", "against", "without", "within", "across", "per",
    "via", "up", "down", "off", "out", "above", "below", "until",
    "among", "around", "towards", "toward", "upon", "onto",
    // pronouns
    "it", "its", "they", "them", "their", "theirs", "we", "us", "our",
    "ours", "you", "your", "yours", "he", "him", "his", "she", "her",
    "hers", "i", "me", "my", "mine", "who", "whom", "whose", "which",
    "what", "there", "here",
    // auxiliaries / copulas / modals
    "is", "are", "was", "were", "be", "been", "being", "am", "has",
    "have", "had", "having", "do", "does", "did", "done", "doing",
    "will", "would", "can", "could", "shall", "should", "may", "might",
    "must", "not",
    // light verbs frequent in job-ad prose (closed by convention here)
    "use", "uses", "using", "used", "work", "works", "working",
    "make", "makes", "making", "made", "provide", "provides",
    "providing", "provided", "ensure", "ensures", "ensuring",
    "include", "includes", "including", "included", "require",
    "requires", "requiring", "required", "also", "well", "able")

  /** Longest chunk kept, in tokens — base noun phrases beyond this are
    * run-on captures, not spaCy-like chunks.
    */
  val MaxTokens = 5

  /** Shared regex source: any boundary word as a whole token. */
  val BoundaryPat: String =
    "\\b(" + BoundaryWords.mkString("|") + ")\\b"

  /** Noun chunks of an already-cleaned (lowercase alnum + spaces) text
    * column, as an array of phrases: boundary words become separators,
    * maximal remaining runs become chunks, trimmed, 1..[[MaxTokens]]
    * tokens, at least 3 characters.
    */
  def chunks(cleaned: Column): Column = {
    val cut = regexp_replace(cleaned, BoundaryPat, "|")
    filter(
      transform(split(cut, "\\|"), s => trim(regexp_replace(s, "\\s+", " "))),
      s => length(s) >= 3 && size(split(s, " ")) <= MaxTokens)
  }

  /** The identical chunking as DuckDB SQL over `expr` (already-cleaned
    * text), returning a list of phrases.
    */
  def chunksSql(expr: String): String =
    s"""list_filter(
       |  list_transform(
       |    string_split(regexp_replace($expr, '$BoundaryPat', '|', 'g'), '|'),
       |    s -> trim(regexp_replace(s, '\\s+', ' ', 'g'))),
       |  s -> length(s) >= 3 AND len(string_split(s, ' ')) <= $MaxTokens)""".stripMargin

  private def cleanSqlOf(x: String) =
    s"trim(regexp_replace(lower($x), '[^a-z0-9]+', ' ', 'g'))"

  private def cleanCol(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  private val q = Q(
    "t_noun_chunks",
    (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"),
          explode(chunks(cleanCol(col("text")))).as("chunk"))
        .groupBy("chunk")
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 3),
    Some(
      s"""SELECT chunk, count(*) AS n_docs FROM (
         |  SELECT doc_id, unnest(${chunksSql(cleanSqlOf("text"))
           .linesIterator.mkString(" ")}) AS chunk
         |  FROM documents)
         |GROUP BY chunk HAVING count(*) >= 3""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
