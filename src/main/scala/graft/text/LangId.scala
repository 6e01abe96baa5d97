package graft.text

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Heuristic language identification (LLM-pipeline text analysis).
  *
  * Two tiers, both driver-free and broadcast-friendly:
  *  1. script detection by Unicode block (CJK → zh, Cyrillic → ru, …);
  *  2. for Latin scripts, cosine over character-trigram frequency against
  *    small built-in profiles (common-trigram lists per language — the
  *    classic Cavnar–Trenkle n-gram ranking, reduced to a fixed profile).
  *
  * Deterministic; ties broken by profile order. A real deployment would
  * swap in larger profiles — the operator shape (pure map, no shuffle)
  * is what matters at scale.
  */
object LangId {

  // top distinguishing trigrams per language (hand-picked from public
  // frequency tables; lowercase, space-padded conventions inline)
  private[text] val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", "ing", " of",
      "of ", " to", "to ", "ed ", " in", "ion", "is "),
    "de" -> Seq("en ", "er ", " de", "der", "ie ", " di", "die", "ch ",
      "ein", "sch", "und", " un", "nd ", "ich", "cht"),
    "fr" -> Seq(" de", "de ", "es ", " le", "le ", "ent", "nt ", "la ",
      " la", "ion", " pa", "que", " qu", "ue ", "re "),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", "el ", " el", "en ",
      " en", "ión", "ar ", " co", "es ", "ado", "que"),
    "it" -> Seq(" di", "di ", " il", "il ", "to ", "la ", " la", "re ",
      "che", " ch", "one", "zio", "lla", " co", "del"),
    "pt" -> Seq(" de", "de ", "os ", " co", "ão ", "ção", " um", "um ",
      "da ", " da", "do ", " do", "em ", " em", "ara"),
    "nl" -> Seq("en ", " de", "de ", "et ", " he", "het", "an ", " va",
      "van", "een", " ee", "er ", " ge", "ijk", "aar"),
  )

  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val cjk = text.codePoints().filter(c =>
      (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3040 && c <= 0x30FF)).count()
    if (cjk * 4 > text.length) {
      val kana = text.codePoints()
        .filter(c => c >= 0x3040 && c <= 0x30FF).count()
      return if (kana > 0) "ja" else "zh"
    }
    val cyr = text.codePoints().filter(c => c >= 0x0400 && c <= 0x04FF).count()
    if (cyr * 4 > text.length) return "ru"
    val hangul = text.codePoints()
      .filter(c => c >= 0xAC00 && c <= 0xD7AF).count()
    if (hangul * 4 > text.length) return "ko"
    val arabic = text.codePoints()
      .filter(c => c >= 0x0600 && c <= 0x06FF).count()
    if (arabic * 4 > text.length) return "ar"

    // Locale.ROOT: a Turkish-family default locale lowercases "I" to
    // dotless ı, silently breaking trigram matches (and oracle parity
    // with DuckDB's locale-independent lower())
    val t = " " + text.toLowerCase(java.util.Locale.ROOT) + " "
    val grams = t.sliding(3).toSeq
    if (grams.isEmpty) return "und"
    val counts = grams.groupBy(identity).map { case (g, v) => g -> v.size }
    val scored = profiles.map { case (lang, prof) =>
      lang -> prof.map(g => counts.getOrElse(g, 0)).sum
    }
    val best = scored.maxBy(_._2)
    if (best._2 == 0) "und" else best._1
  }

  def detectCol(spark: SparkSession)(text: Column): Column = {
    val f = udf((t: String) => detect(t))
    f(text)
  }

  /** DuckDB replica of the Latin-script trigram tier, generated from the
    * SAME profile constants (the TextCleaning pattern: one source of
    * truth, two engines). Overlapping-occurrence counts come from a
    * position unnest; arg-max ties break by profile order, all-zero
    * scores fall back to "und", exactly like `detect`. The Unicode-block
    * tiers are NOT replicated — the oracle corpus is ASCII (asserted for
    * the hash oracles too), so they never fire there; the spec covers
    * them on synthetic non-Latin strings.
    */
  private[text] def oracleSql: String = {
    val rows = profiles.zipWithIndex.flatMap { case ((lang, prof), pri) =>
      prof.map(g => s"('$lang', $pri, '$g')")
    }.mkString(",\n    ")
    s"""WITH prof(plang, pri, g) AS (VALUES
       |    $rows),
       |pad AS (
       |  SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
       |tri AS (
       |  SELECT doc_id, substr(t, CAST(i AS INT), 3) AS g
       |  FROM (SELECT doc_id, t,
       |          unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i
       |        FROM pad)),
       |scores AS (
       |  SELECT doc_id, plang, pri, count(*) AS sc
       |  FROM tri JOIN prof USING (g) GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT doc_id, plang, sc,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY sc DESC, pri ASC) AS rn
       |  FROM scores)
       |SELECT d.doc_id, d.lang,
       |  COALESCE(CASE WHEN b.sc > 0 THEN b.plang END, 'und') AS predicted
       |FROM documents d
       |LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1""".stripMargin
  }
}
