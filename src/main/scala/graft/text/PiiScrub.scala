package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the curation pass every training corpus runs before
  * anything else sees the text. Pure `regexp_replace` chain (codegen'd,
  * map-only, zero shuffle); patterns use only constructs with identical
  * semantics in Java regex and RE2 so the DuckDB oracle replays them
  * exactly (no backrefs, no lookaround).
  *
  * Order matters: emails first (their local parts contain digits), then
  * dotted IPv4, then the greedy phone pattern that would otherwise eat
  * IP fragments.
  */
object PiiScrub {

  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePat = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPat, "<EMAIL>"),
        Ipv4Pat, "<IP>"),
      PhonePat, "<PHONE>")

  def scrubString(s: String): String =
    s.replaceAll(EmailPat, "<EMAIL>")
      .replaceAll(Ipv4Pat, "<IP>")
      .replaceAll(PhonePat, "<PHONE>")

  // round-trip query: plant PII derived from fixture columns, scrub it,
  // and let the oracle replay the same construction + redaction — the
  // patterns are shared constants so the two sides cannot drift
  private def sq(s: String): String = s.replace("'", "''")

  private val q = Q(
    "t_pii_scrub",
    (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"),
          scrub(concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com"),
            lit(" at 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".1 or +44 7911 12"), (col("doc_id") % 100).cast("string"),
            lit("99"))).as("clean")),
    Some(
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(
         |    text || ' contact user' || CAST(doc_id AS VARCHAR)
         |      || '@example.com at 10.0.'
         |      || CAST(doc_id % 256 AS VARCHAR)
         |      || '.1 or +44 7911 12' || CAST(doc_id % 100 AS VARCHAR)
         |      || '99',
         |    '${sq(EmailPat)}', '<EMAIL>', 'g'),
         |    '${sq(Ipv4Pat)}', '<IP>', 'g'),
         |    '${sq(PhonePat)}', '<PHONE>', 'g') AS clean
         |FROM documents""".stripMargin),
  )

  /** k-anonymity audit — the redaction family's structural sibling: a
    * released table is k-anonymous when every quasi-identifier
    * combination covers ≥ k rows; groups below k re-identify individuals
    * and must be suppressed or generalised before publication. One hash
    * aggregate over the quasi-identifier columns; the flag column is the
    * suppression worklist. (PII regexes scrub free text; this audits the
    * STRUCTURED columns the reference publishes.)
    */
  private val kanon = Q(
    "p11_k_anonymity",
    (s, d) =>
      graft.Tables(s, d).customer
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          (col("n") < 10).as("suppress")),
    Some(
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |  count(*) < 10 AS suppress
        |FROM customer GROUP BY 1, 2""".stripMargin),
  )

  /** l-diversity audit — k-anonymity's stronger sibling (Machanavajjhala
    * et al. 2007): a k-anonymous group still leaks when every member
    * shares the same SENSITIVE value (homogeneity attack), so each
    * quasi-identifier group must also span ≥ l distinct sensitive
    * values. One hash aggregate with a count-distinct — at fleet scale
    * the exact distinct swaps for the [[graft.operators.Extended]] HLL
    * register sketch, same group keys.
    */
  private val ldiv = Q(
    "p12_l_diversity",
    (s, d) =>
      graft.Tables(s, d).customer
        .withColumn("acct_band", floor(col("c_acctbal") / 2000))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("acct_band")).as("l_distinct"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          col("l_distinct"), (col("l_distinct") < 3).as("homogeneous")),
    Some(
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |  count(DISTINCT floor(c_acctbal / 2000)) AS l_distinct,
        |  count(DISTINCT floor(c_acctbal / 2000)) < 3 AS homogeneous
        |FROM customer GROUP BY 1, 2""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q, kanon, ldiv)
}
