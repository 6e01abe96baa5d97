package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Enrichment operator semantics, mirroring the reference's behaviour
  * (title cleaning order-sensitivity, tiered SOC match, degree regex,
  * location regex fallbacks, multimap explode-by-join).
  */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("standardiseText: punctuation, digits, case, whitespace") {
    assert(Enrich.standardiseText("Senior  Dev-Ops. Engineer 2021!") ==
      "senior dev ops engineer")
    assert(Enrich.standardiseText("") == "")
    assert(Enrich.standardiseText(null) == "")
  }

  test("cleanRawJobTitle applies ordered replacements and prefix strip") {
    val clean = Enrich.cleanRawJobTitle(
      stopwords = Seq("urgent"),
      locations = Seq("london"),
      acronyms = Seq("swe" -> "software engineer"),
      ignorePrefixes = Seq("senior"),
    ) _
    assert(clean("URGENT: SWE (London) 2021") == "software engineer")
    assert(clean("Senior Data Engineer") == "data engineer")
    // prefix only strips when it is the whole first word
    assert(clean("Seniority Manager") == "seniority manager")
  }

  test("SocMatcher: exact tier, then longest partial, both directions") {
    val m = new Enrich.SocMatcher(Seq(
      "data engineer", "engineer", "data", "senior data engineer"))
    assert(m.predict("data engineer").contains(("exact", "data engineer")))
    // forward: query contains a title ("lead data engineer" ⊃ "data engineer")
    assert(m.predict("lead data engineer x")
      .contains(("partial", "data engineer")))
    // backward: a title contains the query ("senior data engineer" ⊃ "ata engi")
    assert(m.predict("nior data engin")
      .contains(("partial", "senior data engineer")))
    assert(m.predict("zzz").isEmpty)
  }

  test("requiresDegree lookahead regex with bracket/truncation cleanup") {
    val df = Seq(
      "[Requires a BSc in physics or similar truncat",
      "[no degree needed here at all truncat",
      "phd required",
      "scuba diving instructor",
    ).toDF("description")
      .select(col("description"),
        Enrich.requiresDegree(lower(col("description"))).as("rd"))
    val got = df.collect().map(r => r.getString(0).take(12) -> r.getBoolean(1))
      .toMap
    assert(got("[Requires a "))
    assert(!got("[no degree n"))
    assert(!got("phd required") == false)
    assert(!got("scuba diving"))
  }

  test("locationRegex: outcode wins, else cleaned placename") {
    val df = Seq("Leeds LS1, West Yorkshire", "Jobs in Greater Manchester",
      "York", "  ").toDF("loc")
      .select(col("loc"), Enrich.locationRegex(col("loc")).as("out"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("Leeds LS1, West Yorkshire") == "LS1")
    assert(got("Jobs in Greater Manchester") == "greater_manchester")
    assert(got("York") == "york")
  }

  test("locationMatch explodes one name into all its codes") {
    val ads = Seq(("1", "London"), ("2", "Nowhere")).toDF("id", "job_location_raw")
    val lookup = Seq(("E1", "London"), ("E2", "London"), ("N1", "Newcastle"))
      .toDF("ipn_18_code", "ipn_18_name")
    val got = Enrich.locationMatch(ads, lookup)
      .select("id", "ipn_18_code").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("1", "E1"), ("1", "E2"))) // ad 2 has no match
  }

  test("detectSkills emits one row per detected surface form") {
    val ads = Seq(("1", "needs sql and data analysis skills"),
      ("2", "nothing")).toDF("id", "description")
    val got = Enrich.detectSkills(spark, ads, Seq("sql", "data analysis"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("1", "sql"), ("1", "data analysis")))
  }

  test("cleanSkillText: bullets, camel case, lemma dictionary") {
    val df = Seq("Communication•TeamWork skills").toDF("t")
      .select(Enrich.cleanSkillText(spark,
        Map("skills" -> "skill"))(col("t")).as("c"))
    assert(df.head().getString(0) == "communication,team. work skill")
  }
}
