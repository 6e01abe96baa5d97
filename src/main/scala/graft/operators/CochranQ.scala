package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Cochran's Q — McNemar generalised to k matched binary treatments:
  * do THREE quality gates (length, token count, mean word length)
  * pass significantly different fractions of the same corpus?
  * Rejecting Q means the gates are not interchangeable and the
  * pipeline's kept-set depends on which one runs.
  *
  *   Q = (k−1) · (k·ΣC_j² − T²) / (k·T − ΣR_i²)
  *
  * with C_j the per-gate pass totals, R_i the per-document pass
  * counts, T the grand total. EXACT: numerator and denominator are
  * pure BIGINT from ONE corpus aggregate (the per-document R_i and
  * R_i² fold into sums of products of the three indicator columns —
  * no per-document grouping needed), one final IEEE divide.
  */
object CochranQ {

  private val q = Q(
    "a80_cochran_q",
    (s, d) => {
      val toks = size(split(trim(col("text")), "\\s+")).cast("long")
      val lab = Tables(s, d).documents.select(
        (col("n_chars") >= 500).cast("long").as("a"),
        (toks >= 100).cast("long").as("b"),
        (col("n_chars") >= toks * 5L).cast("long").as("c"))
      // R_i = a+b+c; ΣR_i² expands to Σa+Σb+Σc + 2(Σab+Σac+Σbc)
      val m = lab.agg(count(lit(1)).as("n"),
        sum(col("a")).as("ca"), sum(col("b")).as("cb"),
        sum(col("c")).as("cc"),
        sum(col("a") * col("b")).as("sab"),
        sum(col("a") * col("c")).as("sac"),
        sum(col("b") * col("c")).as("sbc"))
      val t = col("ca") + col("cb") + col("cc")
      val sumR2 = t + lit(2L) * (col("sab") + col("sac") + col("sbc"))
      val sumC2 = col("ca") * col("ca") + col("cb") * col("cb") +
        col("cc") * col("cc")
      m.select(col("n"), col("ca"), col("cb"), col("cc"),
        (lit(3L) * t - sumR2).as("denom"),
        round(lit(2.0) * (lit(3L) * sumC2 - t * t).cast("double") /
          (lit(3L) * t - sumR2).cast("double"), 6).as("q_stat"))
    },
    Some(
      """WITH lab AS (
        |  SELECT CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 100
        |      THEN 1 ELSE 0 END AS b,
        |    CASE WHEN n_chars >=
        |        5 * len(string_split_regex(trim(text), '\s+'))
        |      THEN 1 ELSE 0 END AS c
        |  FROM documents),
        |m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb,
        |    CAST(sum(c) AS BIGINT) AS cc,
        |    CAST(sum(a * b) AS BIGINT) AS sab,
        |    CAST(sum(a * c) AS BIGINT) AS sac,
        |    CAST(sum(b * c) AS BIGINT) AS sbc
        |  FROM lab)
        |SELECT n, ca, cb, cc,
        |  CAST(3 * (ca + cb + cc)
        |    - ((ca + cb + cc) + 2 * (sab + sac + sbc)) AS BIGINT)
        |    AS denom,
        |  round(2.0 * CAST(3 * (ca*ca + cb*cb + cc*cc)
        |      - (ca + cb + cc) * (ca + cb + cc) AS DOUBLE)
        |    / CAST(3 * (ca + cb + cc)
        |      - ((ca + cb + cc) + 2 * (sab + sac + sbc)) AS DOUBLE), 6)
        |    AS q_stat
        |FROM m""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
