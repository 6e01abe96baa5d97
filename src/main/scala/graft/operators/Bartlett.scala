package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bartlett's test for homogeneity of variances across k groups —
  * the parametric sibling of a84 Brown–Forsythe (Bartlett is the
  * most powerful of the variance gates when normality holds, which
  * is exactly what a88 Jarque–Bera certifies first):
  *
  *   χ² = [ (N−k)·ln Sp² − Σ (nᵢ−1)·ln sᵢ² ] / C
  *   C  = 1 + ( Σ 1/(nᵢ−1) − 1/(N−k) ) / (3(k−1))
  *
  * Per-group Σx / Σx² are decimal-EXACT (2-dp values → scales 2/4);
  * each sᵢ² is one IEEE chain from them; the three k-row reductions
  * go through decimal-stable sums (ln-term scale 9 per the a77/a81
  * precedent; the (nᵢ−1)sᵢ² term at scale 6 holds the 2^53 cast
  * bound through sf1000 — beyond that drop to scale 3).
  *
  * Shape: ONE map-side-combinable fact aggregate to k=|event_type|
  * rows; everything after is k-row arithmetic. One scan at any scale.
  */
object Bartlett {

  private val q = Q(
    "a89_bartlett_test",
    (s, d) => {
      val g = Tables(s, d).events
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(30, 2)))
            .cast("double").as("sx"),
          sum((col("value") * col("value")).cast(DecimalType(30, 4)))
            .cast("double").as("sxx"))
        .withColumn("s2",
          expr("(sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)"))
      val red = g.agg(
        sum(col("n")).as("nn"),
        count(lit(1)).as("k"),
        Stable.dsum((col("n").cast("double") - 1.0) * col("s2"), 6)
          .as("ssw"),
        Stable.dsum((col("n").cast("double") - 1.0) * log(col("s2")), 9)
          .as("sln"),
        Stable.dsum(lit(1.0) / (col("n").cast("double") - 1.0), 15)
          .as("sinv"))
      red.selectExpr(
        "nn AS n", "k",
        "round((CAST(nn - k AS DOUBLE) * ln(ssw / CAST(nn - k AS DOUBLE)) - sln) " +
          "/ (1.0 + (sinv - 1.0 / CAST(nn - k AS DOUBLE)) / (3.0 * CAST(k - 1 AS DOUBLE))), 6) AS chi2",
        "round(1.0 + (sinv - 1.0 / CAST(nn - k AS DOUBLE)) / (3.0 * CAST(k - 1 AS DOUBLE)), 9) AS c")
    },
    Some(
      s"""WITH g AS (
         |  SELECT event_type, count(*) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE) AS sxx
         |  FROM events GROUP BY 1),
         |g2 AS (
         |  SELECT *, (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS s2
         |  FROM g),
         |red AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k,
         |    ${Stable.dsumSql("(CAST(n AS DOUBLE) - 1.0) * s2", 6)} AS ssw,
         |    ${Stable.dsumSql("(CAST(n AS DOUBLE) - 1.0) * ln(s2)", 9)} AS sln,
         |    ${Stable.dsumSql("1.0 / (CAST(n AS DOUBLE) - 1.0)", 15)} AS sinv
         |  FROM g2)
         |SELECT nn AS n, k,
         |  round((CAST(nn - k AS DOUBLE) * ln(ssw / CAST(nn - k AS DOUBLE)) - sln)
         |    / (1.0 + (sinv - 1.0 / CAST(nn - k AS DOUBLE)) / (3.0 * CAST(k - 1 AS DOUBLE))), 6) AS chi2,
         |  round(1.0 + (sinv - 1.0 / CAST(nn - k AS DOUBLE)) / (3.0 * CAST(k - 1 AS DOUBLE)), 9) AS c
         |FROM red""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
