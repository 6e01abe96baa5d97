package graft.dedup

import graft.{Q, Tables}
import graft.text.UrlCanonicalize
import org.apache.spark.sql.functions._

/** URL-keyed exact dedup — the first dedup stage a web corpus runs,
  * BEFORE any content hashing: two crawls of one page differ in
  * tracking params and fragment, so grouping on the CANONICAL URL
  * (t_url_canonicalize's normal form) collapses them without reading
  * body bytes at all. Exemplar = min doc_id (the D5 rule); the
  * output keeps group size so the collapse rate is auditable.
  *
  * Shape: map-only canonicalization fused into the scan, ONE
  * group-by on the canonical key carrying (size, exemplar) — no
  * content movement, the cheapest dedup pass there is at 100 TB.
  */
object UrlDedup {

  private def messy = concat(
    // fixed host: the two crawls of a page come from one site; the
    // crawl-specific source survives only inside the stripped ref param
    lit("HTTPS://WWW.Example.COM/Doc/"),
    // crawl-duplicate construction: doc pairs (2k, 2k+1) share a page id
    expr("doc_id div 2"),
    when(col("doc_id") % 2 === 0,
      concat(lit("?utm_source=x&ref="), col("source"), lit("&b=2&a=1")))
      .otherwise(concat(lit("?a=1&ref="), col("source"),
        lit("&utm_campaign=y&b=2"))),
    concat(lit("#sec"), col("doc_id") % 5))

  private val q = Q(
    "d_url_dedup_groups",
    (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"), messy.as("url"))
        .select(col("doc_id"),
          UrlCanonicalize.canonicalize(col("url")).as("canonical"))
        .groupBy("canonical")
        .agg(count(lit(1)).as("group_size"),
          min(col("doc_id")).as("exemplar"))
        .filter(col("group_size") > 1),
    Some(
      """WITH u AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.Example.COM/Doc/'
        |    || CAST(doc_id // 2 AS VARCHAR)
        |    || CASE WHEN doc_id % 2 = 0
        |         THEN '?utm_source=x&ref=' || source || '&b=2&a=1'
        |         ELSE '?a=1&ref=' || source || '&utm_campaign=y&b=2' END
        |    || '#sec' || (doc_id % 5) AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM u),
        |p2 AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(nofrag,
        |      '^[A-Za-z]+://([^/?#]+)', 1)) AS host,
        |    regexp_replace(regexp_extract(nofrag,
        |      '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/$', '') AS path,
        |    regexp_extract(nofrag, '\?([^#]*)', 1) AS query
        |  FROM parts),
        |p3 AS (
        |  SELECT doc_id,
        |    'https://' || host || path ||
        |    CASE WHEN array_to_string(list_sort(list_filter(
        |           string_split(query, '&'),
        |           p -> NOT regexp_matches(p,
        |                  '^(utm_[^=]*|fbclid|gclid|ref)=') AND p <> '')),
        |           '&') <> ''
        |         THEN '?' || array_to_string(list_sort(list_filter(
        |           string_split(query, '&'),
        |           p -> NOT regexp_matches(p,
        |                  '^(utm_[^=]*|fbclid|gclid|ref)=') AND p <> '')),
        |           '&')
        |         ELSE '' END AS canonical
        |  FROM p2)
        |SELECT canonical, count(*) AS group_size,
        |  CAST(min(doc_id) AS BIGINT) AS exemplar
        |FROM p3 GROUP BY 1 HAVING count(*) > 1""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
