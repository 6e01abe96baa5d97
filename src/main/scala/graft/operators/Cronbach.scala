package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Cronbach's alpha — internal-consistency reliability of a composite
  * score: do the three per-document size signals (chars, whitespace
  * tokens, word runs) measure one underlying "document volume"
  * construct, or would a composite quality score built from them be
  * incoherent? The psychometric staple
  *
  *   α = k/(k−1) · (1 − Σᵢ var(itemᵢ) / var(Σᵢ itemᵢ))
  *
  * via scaled centered moments M_ab = n·S_ab − S_a·S_b, which stay
  * EXACT BIGINT from one corpus aggregate (the total-score variance
  * expands as ΣM_ii + 2·Σ_{i<j} M_ij, so no fourth column is ever
  * materialised); α is then a single IEEE expression.
  *
  * Shape: ONE map-side-combinable aggregate over the corpus — the
  * reliability of a 100 TB composite costs one scan.
  */
object Cronbach {

  private val q = Q(
    "a82_cronbach_alpha",
    (s, d) => {
      val x1 = col("n_chars")
      val x2 = size(split(col("text"), " ")).cast("long")
      val x3 = size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).cast("long")
      val m = Tables(s, d).documents
        .select(x1.as("x1"), x2.as("x2"), x3.as("x3"))
        .agg(count(lit(1)).as("n"),
          sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
          sum(col("x3")).as("s3"),
          sum(col("x1") * col("x1")).as("s11"),
          sum(col("x2") * col("x2")).as("s22"),
          sum(col("x3") * col("x3")).as("s33"),
          sum(col("x1") * col("x2")).as("s12"),
          sum(col("x1") * col("x3")).as("s13"),
          sum(col("x2") * col("x3")).as("s23"))
      val m11 = col("n") * col("s11") - col("s1") * col("s1")
      val m22 = col("n") * col("s22") - col("s2") * col("s2")
      val m33 = col("n") * col("s33") - col("s3") * col("s3")
      val m12 = col("n") * col("s12") - col("s1") * col("s2")
      val m13 = col("n") * col("s13") - col("s1") * col("s3")
      val m23 = col("n") * col("s23") - col("s2") * col("s3")
      val items = (m11 + m22 + m33).cast("double")
      val total = (m11 + m22 + m33 +
        lit(2L) * (m12 + m13 + m23)).cast("double")
      m.select(col("n"),
        round(lit(1.5) * (lit(1.0) - items / total), 6).as("alpha"))
    },
    Some(
      """WITH x AS (
        |  SELECT n_chars AS x1,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x2,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z]+'))
        |      AS BIGINT) AS x3
        |  FROM documents),
        |m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
        |    CAST(sum(x3) AS BIGINT) AS s3,
        |    CAST(sum(x1*x1) AS BIGINT) AS s11,
        |    CAST(sum(x2*x2) AS BIGINT) AS s22,
        |    CAST(sum(x3*x3) AS BIGINT) AS s33,
        |    CAST(sum(x1*x2) AS BIGINT) AS s12,
        |    CAST(sum(x1*x3) AS BIGINT) AS s13,
        |    CAST(sum(x2*x3) AS BIGINT) AS s23
        |  FROM x)
        |SELECT n,
        |  round(1.5 * (1.0
        |    - CAST((n*s11 - s1*s1) + (n*s22 - s2*s2) + (n*s33 - s3*s3)
        |        AS DOUBLE)
        |    / CAST((n*s11 - s1*s1) + (n*s22 - s2*s2) + (n*s33 - s3*s3)
        |        + 2 * ((n*s12 - s1*s2) + (n*s13 - s1*s3)
        |               + (n*s23 - s2*s3)) AS DOUBLE)), 6) AS alpha
        |FROM m""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
