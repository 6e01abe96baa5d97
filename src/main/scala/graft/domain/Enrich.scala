package graft.domain

import graft.text.PhraseMatch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The per-feature enrichment operators (SURVEY §2.3 J4/J8/J9, §2.7
  * F5/F6/F11/F12) — each a `DataFrame => DataFrame`, model state
  * broadcast, applied as a map stage.
  */
object Enrich {

  // ---- F5: job-title cleaning (flows/enrich/labs/soc/common.py:48-99) --

  /** standardise_text: punctuation→space (keep word chars), strip
    * digits, lower, collapse whitespace.
    */
  def standardiseText(s: String): String =
    if (s == null) ""
    else "[A-Za-z0-9]+".r.findAllIn(s).mkString(" ")
      .filterNot(_.isDigit)
      .trim.toLowerCase
      .replaceAll("\\s+", " ")

  /** clean_raw_job_title: three ordered replace passes (stopwords,
    * locations, acronym map — plain substring replace, in iteration
    * order, exactly like the reference's str.replace loop), then prefix
    * strip and re-standardise.
    */
  def cleanRawJobTitle(
      stopwords: Seq[String],
      locations: Seq[String],
      acronyms: Seq[(String, String)],
      ignorePrefixes: Seq[String],
  )(raw: String): String = {
    def replaceAll(text: String, pairs: Seq[(String, String)]): String =
      pairs.foldLeft(text) { case (t, (from, to)) =>
        if (t.contains(from)) t.replace(from, to) else t
      }
    var text = raw
    for (words <- Seq(stopwords.map(_ -> ""), locations.map(_ -> ""), acronyms)) {
      text = standardiseText(text)
      text = replaceAll(text, words)
    }
    text = standardiseText(text)
    for (prefix <- ignorePrefixes) {
      val idx = text.indexOf(' ')
      val (first, rest) = if (idx < 0) (text, "") else text.splitAt(idx)
      if (first == prefix) text = rest.trim
    }
    standardiseText(text)
  }

  def cleanTitleCol(spark: SparkSession, stopwords: Seq[String],
      locations: Seq[String], acronyms: Seq[(String, String)],
      ignorePrefixes: Seq[String])(c: Column): Column = {
    val f = cleanRawJobTitle(stopwords, locations, acronyms, ignorePrefixes) _
    val b = spark.sparkContext.broadcast(f)
    udf((s: String) => if (s == null) null else b.value(s)).apply(c)
  }

  // ---- J8: tiered SOC title match (labs/soc/substring_utils.py:73-135) --

  /** predict: exact set hit, else forward partial (longest title
    * contained in the query, titles pre-sorted by word count desc) and
    * backward partial (shortest title containing the query), returning
    * the longer of the two partials — reference semantics 1:1.
    */
  final class SocMatcher(titles: Seq[String]) extends Serializable {
    private val sorted = titles.sortBy(t => -t.count(_ == ' '))
    private val set = titles.toSet

    def predict(cleanTitle: String): Option[(String, String)] = {
      if (set.contains(cleanTitle)) return Some(("exact", cleanTitle))
      val fwd = sorted
        .filter(t => cleanTitle.length > t.length)
        .find(t => cleanTitle.contains(t))
      val bwd = sorted.reverse
        .filter(t => t.length > cleanTitle.length)
        .find(t => t.contains(cleanTitle))
      Seq(fwd, bwd).flatten.sortBy(-_.length).headOption
        .map(m => ("partial", m))
    }
  }

  def socMatchCol(spark: SparkSession, titles: Seq[String])(c: Column): Column = {
    val b = spark.sparkContext.broadcast(new SocMatcher(titles))
    udf((s: String) =>
      if (s == null) null
      else b.value.predict(s).map { case (tier, m) => s"$tier:$m" }.orNull)
      .apply(c)
  }

  // ---- F11: requires-degree regex (labs/requires_degree/model) ----

  val DegreeExpression: String =
    "(?=(\\bba\\b|\\bbsc\\b|\\bmsc\\b|\\bmasters\\b|\\bphd\\b|" +
      "\\bbachelor's\\b|\\bmaster's\\b))"

  /** clean_description: strip Reed's outer brackets and the (possibly
    * truncated) last term, then apply the lookahead regex.
    */
  def requiresDegree(description: Column): Column = {
    val unbracketed = regexp_replace(regexp_replace(description,
      "^\\[", ""), "\\]$", "")
    val stripped = when(instr(unbracketed, " ") > 0,
      regexp_replace(unbracketed, "\\s+\\S*$", "")).otherwise(unbracketed)
    stripped.rlike(DegreeExpression)
  }

  // ---- F12 + J4: location regex + multimap lookup (labs/locations) ----

  /** UK postcode outcode if present (spaces removed), else the cleaned
    * first comma segment lowercased with underscores — the reference's
    * regex_model closure as column algebra.
    */
  def locationRegex(raw: Column, boilerplate: String = "Jobs in "): Column = {
    val outcode = regexp_extract(raw, "\\b[A-Z]{1,2}[0-9][A-Z0-9]?\\b", 0)
    val cleaned = regexp_replace(regexp_replace(regexp_replace(
      lower(regexp_replace(split(raw, ",").getItem(0), boilerplate, "")),
      " ", "_"), "^_+", ""), "_+$", "")
    when(outcode =!= "", regexp_replace(outcode, " ", "")).otherwise(cleaned)
  }

  /** J4: explode-by-join of the name→codes multimap: one output row per
    * (ad, matching code); zero or many matches allowed.
    */
  def locationMatch(ads: DataFrame, lookup: DataFrame): DataFrame =
    ads.join(broadcast(lookup),
      col("job_location_raw") === col("ipn_18_name"), "inner")

  // ---- J9 + F6: skills detection over cleaned text ----

  /** F6 core regex passes: bullets→comma, camel-case sentence split,
    * lowercase, whitespace collapse (labs/skills/text_cleaning_utils);
    * lemmatisation is a broadcast dictionary pass (documented divergence
    * from WordNet).
    */
  def cleanSkillText(spark: SparkSession,
      lemmaDict: Map[String, String])(c: Column): Column = {
    val regexCleaned = trim(regexp_replace(lower(regexp_replace(
      regexp_replace(c, "[•·▪–\\-*]+", ","), // bullets → comma
      "([a-z])([A-Z])", "$1. $2")), // camelCase sentence split
      "\\s+", " "))
    val b = spark.sparkContext.broadcast(lemmaDict)
    val lemma = udf((s: String) =>
      if (s == null) null
      else s.split(" ").map(w => b.value.getOrElse(w, w)).mkString(" "))
    lemma(regexCleaned)
  }

  /** detect_skills: all dictionary surface forms found in the cleaned
    * text, one row per (ad, surface form) — Aho–Corasick broadcast UDF
    * + explode (the Generator/UDTF shape, SURVEY §2.8).
    */
  def detectSkills(spark: SparkSession, ads: DataFrame,
      surfaceForms: Seq[String], textCol: String = "description"): DataFrame =
    ads.select(col("id"),
      explode(PhraseMatch.matchPhrases(spark, surfaceForms)(col(textCol)))
        .as("surface_form"))
}
