package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closes the lemmatiser's documented WordNet residual
  * (ref text_cleaning_utils.py:51-54 — NLTK `lemmatize(term)`, noun
  * morphy): `lemmatiseIndexed` must replay morphy's index-filtered
  * algorithm exactly against a curated index slice, and the DEFAULT
  * table+rules `lemmatise` must agree with it on the ENTIRE fixture
  * vocabulary — so no registered query can observe a divergence.
  */
class LemmatiserIndexSpec extends SparkSpec {

  /** A WordNet index.noun slice: lemmas relevant to the tricky suffix
    * families plus everything the fixture corpus can produce. Index
    * membership is the whole mechanism under test.
    */
  private val indexSlice: Set[String] = Set(
    // -ves family: the ves→f rule must lose to s→"" via the index
    "wave", "waves", "move", "nerve", "curve", "valve", "grove",
    "sleeve", "stove", "dove", "glove", "wolf", "calf", "knife", "leaf",
    // -ses family: houses→house (ses→s wrong), gases→gas (s→"" wrong)
    "house", "nose", "phase", "cause", "case", "base", "gas", "basis",
    "crisis", "analysis", "lens",
    // index-protected: the word IS the lemma and shorter than any rule
    // output (or exceptions map it to itself via the min-length pick)
    "series", "species", "news", "physics", "data", "datum", "media",
    "medium", "kudos",
    // -men family (the plural forms deliberately NOT in the slice, so
    // the exception entries resolve to the singulars unambiguously)
    "man", "woman", "specimen", "acumen",
    // ordinary regulars
    "table", "value", "row", "scan", "hash", "spark", "merge", "fast",
    "query", "queries", "engine", "index", "matrix", "vertex", "box",
    "church", "dish", "quiz", "hero", "potato", "echo")

  private def lem(w: String) = TextCleaning.lemmatiseIndexed(w, indexSlice)

  test("indexed morphy replays NLTK on the tricky suffix families") {
    // ves→f must NOT fire when s→"" survives the index (NLTK: 'waves'
    // → ['wave'], never 'waf'); where the -f lemma is real it must
    assert(lem("waves") == "wave")
    assert(lem("moves") == "move")
    assert(lem("gloves") == "glove")
    assert(lem("wolves") == "wolf")
    assert(lem("knives") == "knife")
    // ses→s only via the index: houses→house, gases→gas
    assert(lem("houses") == "house")
    assert(lem("gases") == "gas")
    assert(lem("phases") == "phase")
    assert(lem("lenses") == "lens")
    // index-protected invariants (no rule output indexed, or the word
    // itself is the shortest indexed candidate)
    assert(lem("series") == "series")
    assert(lem("news") == "news")
    assert(lem("physics") == "physics")
    assert(lem("kudos") == "kudos")
    // exception + min-length pick: data (4) beats datum (5)
    assert(lem("data") == "data")
    assert(lem("media") == "media")
    // men→man only for the irregular, not inside -men lemmas
    assert(lem("men") == "man")
    assert(lem("women") == "woman")
    assert(lem("specimen") == "specimen")
    assert(lem("acumen") == "acumen")
    // multi-step rule iteration: 'queries' → ies→y in one step
    assert(lem("queries") == "query")
    // no indexed candidate anywhere → input unchanged (NLTK fallback):
    // 'heroes'/'potatoes'/'echoes' have no matching noun substitution
    // chain landing in the index, so WordNet returns them verbatim
    assert(lem("heroes") == "heroes")
    assert(lem("potatoes") == "potatoes")
    assert(lem("echoes") == "echoes")
    // non-lowercase-alpha passes through like WordNet misses
    assert(lem("C++") == "C++")
    assert(lem("Tables") == "Tables")
  }

  test("default lemmatiser == indexed morphy on the full fixture vocabulary") {
    // every lowercase alphabetic token the documents corpus can feed the
    // pipeline, at both verified scale factors — if the two disagree on
    // any of them, some registered query could observe the residual
    val vocab = Seq(sf("sf0.001"), sf("sf0.01")).map { d =>
      spark.read.parquet(s"$d/documents.parquet")
        .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
        .filter(length(col("w")) > 0).distinct()
    }.reduce(_ union _).distinct().collect().map(_.getString(0))
    assert(vocab.nonEmpty)
    val disagree = vocab.filter(w =>
      TextCleaning.lemmatise(w) != TextCleaning.lemmatiseIndexed(w, indexSlice))
    assert(disagree.isEmpty,
      s"lemmatiser residual observable on fixture vocab: ${disagree.toSeq}")
  }
}
