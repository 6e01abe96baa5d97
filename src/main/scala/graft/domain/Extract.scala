package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Extract stage (SURVEY §2.1 S1-S2 + §2.7 F1–F3): raw job-board HTML →
  * declared schema, as a single narrow column pipeline over
  * `spark.read.text`/`binaryFile` input — the reference's
  * listing→chunk→AWS-Batch fan-out (flows/extract/reed.py:192-230)
  * collapses into one shuffle-free scan stage.
  *
  * Parsing mirror of get_reed_details (flows/extract/reed.py:93-145):
  *  - dataLayer fields via regex `field: (.*),` with quote strip (F1);
  *  - salary numbers/unit/currency from `<meta itemprop=... content=...>`
  *    inside the baseSalary span, nulled when the span says
  *    competitive/negotiable;
  *  - description = tag-stripped `<span itemprop="description">` (F2);
  *  - ads without "baseSalary" are legacy pages → dropped.
  */
object Extract {

  private val dataLayerFields: Seq[(String, String)] = Seq(
    "id" -> "jobId",
    "created_raw" -> "jobPostedDate",
    "job_title_raw" -> "jobTitle",
    "job_location_raw" -> "jobLocation",
    "company_raw" -> "jobRecruiterName",
    "contract_type_raw" -> "jobType",
  )

  private def dataLayer(text: Column, field: String): Column = {
    val v = regexp_extract(text, s"$field: (.*),", 1)
    when(v =!= "", regexp_replace(v, "'", ""))
  }

  private def metaContent(span: Column, itemprop: String): Column = {
    val v = regexp_extract(span,
      s"""<meta[^>]*itemprop="$itemprop"[^>]*content="([^"]*)"""", 1)
    when(v =!= "", v)
  }

  /** Strip tags (F2): parity with the reference's strip_html on the
    * fixture corpus — tags removed, entities left, whitespace collapsed.
    */
  def stripHtml(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]+>", " "), "\\s+", " "))

  /** @param raw one row per page with a `text` column of HTML.
    * @return RawJobAd-shaped rows (subset of columns the HTML carries).
    */
  def reed(raw: DataFrame): DataFrame = {
    val text = col("text")
    val salarySpan = regexp_extract(text,
      "(?s)(<span[^>]*itemprop=\"baseSalary\".*?</span>)", 1)
    val isCompetitive = lower(salarySpan).contains("competitive")
    val isNegotiable = lower(salarySpan).contains("negotiable")
    val hasSalary = !(isCompetitive || isNegotiable)
    def salaryMeta(itemprop: String): Column =
      when(hasSalary, metaContent(salarySpan, itemprop))
    val descSpan = regexp_extract(text,
      "(?s)(<span[^>]*itemprop=\"description\".*?</span>)", 1)

    raw
      .filter(text.contains("baseSalary"))
      .select(
        dataLayerFields.map { case (out, in) => dataLayer(text, in).as(out) } ++
          Seq(
            lit("Reed").as("data_source"),
            to_timestamp(dataLayer(text, "jobPostedDate"), "dd/MM/yyyy")
              .as("created"), // F3 day-first
            stripHtml(descSpan).as("description"),
            salaryMeta("value").cast("double").as("raw_salary"),
            salaryMeta("minValue").cast("double").as("raw_min_salary"),
            salaryMeta("maxValue").cast("double").as("raw_max_salary"),
            salaryMeta("unitText").as("raw_salary_unit"),
            salaryMeta("currency").as("raw_salary_currency"),
            isCompetitive.as("salary_competitive"),
            isNegotiable.as("salary_negotiable"),
          ): _*)
      .filter(col("id").isNotNull)
  }

  /** Indeed parser mirror of get_indeed_details
    * (flows/extract/indeed.py:22-57): JSON-ish fields are lazy regex
    * captures `"<field>":(.*?),` with quote strip (the reference's
    * regex_search), the apply-URL is the `data-indeed-apply-joburl`
    * attribute of the `indeed-apply-widget` span, and the description is
    * the tag-stripped `jobsearch-jobDescriptionText` div. The company
    * pattern is `ompanyName":` — matching both `companyName` and
    * `hiringCompanyName`, exactly like the reference. Contract type and
    * closing date are structurally absent from Indeed (reference sets
    * None).
    *
    * @param scrapeDate the reference stamps `created` with the scrape
    *   day (`datetime.today()`, indeed.py:40); a parameter here so runs
    *   are deterministic and backfills are honest about scrape time.
    */
  def indeed(raw: DataFrame, scrapeDate: String): DataFrame = {
    val text = col("text")
    def jsonField(field: String): Column = {
      val v = regexp_extract(text, "\"" + field + "\":(.*?),", 1)
      when(v =!= "", regexp_replace(v, "\"", ""))
    }
    val company = {
      val v = regexp_extract(text, "ompanyName\":(.*?),", 1)
      when(v =!= "", regexp_replace(v, "\"", ""))
    }
    val widget = regexp_extract(text,
      "(?s)(<span[^>]*class=\"indeed-apply-widget\"[^>]*>)", 1)
    val url = regexp_extract(widget,
      "data-indeed-apply-joburl=\"([^\"]*)\"", 1)
    val descDiv = regexp_extract(text,
      "(?s)<div[^>]*class=\"jobsearch-jobDescriptionText\"[^>]*>(.*?)</div>",
      1)
    raw.select(
      jsonField("jobKey").as("id"),
      lit("Indeed").as("data_source"),
      when(url =!= "", url).as("url"),
      lit(scrapeDate).cast("date").as("created"),
      jsonField("jobTitle").as("job_title_raw"),
      jsonField("jobLocation").as("job_location_raw"),
      company.as("company_raw"),
      lit(null).cast("string").as("contract_type_raw"),
      when(descDiv =!= "", stripHtml(descDiv)).as("description"),
      lit(null).cast("string").as("closing_date_raw"),
      jsonField("salaryText").as("job_salary_raw"),
    ).filter(col("id").isNotNull)
  }
}
