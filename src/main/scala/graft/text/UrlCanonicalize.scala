package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization step web-corpus dedup
  * keys on (two crawls of one page differ only in tracking params,
  * host case, fragments and param order): lowercase the scheme+host,
  * drop the fragment, strip tracking parameters (utm_*, fbclid,
  * gclid, ref), SORT the surviving query params, drop a trailing
  * slash. Everything is array/regexp expressions — map-only,
  * codegen-friendly, no UDF.
  *
  * The messy input URL is synthesized deterministically per document
  * (the t_url_domains discipline: the corpus has no real URL column,
  * so the fixture IS the query's input contract — mixed case, two
  * param orders, optional fragment).
  */
object UrlCanonicalize {

  /** Canonical form of a URL column (see object doc for the rules). */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val host = lower(regexp_extract(noFrag,
      "^[A-Za-z]+://([^/?#]+)", 1))
    val path = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
      "/$", "")
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=") && p =!= "")),
      "&")
    concat(lit("https://"), host, path,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(lit("")))
  }

  private def messyUrl: Column = concat(
    lit("HTTPS://WWW."), col("source"), lit(".Example.COM/Doc/"),
    col("doc_id"),
    when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
    when(col("doc_id") % 2 === 0,
      concat(lit("?utm_source=x&ref="), col("source"), lit("&b=2&a=1")))
      .otherwise(concat(lit("?a=1&ref="), col("source"),
        lit("&utm_campaign=y&b=2"))),
    concat(lit("#sec"), col("doc_id") % 5))

  private val q = Q(
    "t_url_canonicalize",
    (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"), messyUrl.as("url"))
        .select(col("doc_id"), col("url"),
          canonicalize(col("url")).as("canonical")),
    Some(
      """WITH u AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.' || source || '.Example.COM/Doc/' || doc_id
        |    || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
        |    || CASE WHEN doc_id % 2 = 0
        |         THEN '?utm_source=x&ref=' || source || '&b=2&a=1'
        |         ELSE '?a=1&ref=' || source || '&utm_campaign=y&b=2' END
        |    || '#sec' || (doc_id % 5) AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, url,
        |    regexp_replace(url, '#.*$', '') AS nofrag
        |  FROM u),
        |p2 AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(nofrag,
        |      '^[A-Za-z]+://([^/?#]+)', 1)) AS host,
        |    regexp_replace(regexp_extract(nofrag,
        |      '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/$', '') AS path,
        |    regexp_extract(nofrag, '\?([^#]*)', 1) AS query
        |  FROM parts),
        |p3 AS (
        |  SELECT doc_id, url, host, path,
        |    array_to_string(list_sort(list_filter(
        |      string_split(query, '&'),
        |      p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)=')
        |           AND p <> '')), '&') AS kept
        |  FROM p2)
        |SELECT doc_id, url,
        |  'https://' || host || path
        |    || CASE WHEN kept <> '' THEN '?' || kept ELSE '' END
        |    AS canonical
        |FROM p3""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
