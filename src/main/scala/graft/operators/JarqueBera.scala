package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Jarque–Bera normality test — the moment-based gate run before any
  * of the z/t rows (a34, a87) are trusted: JB = n/6·(g₁² + g₂²/4)
  * with g₁ the sample skewness m₃/m₂^{3/2} and g₂ the excess
  * kurtosis m₄/m₂² − 3. The four raw power sums are decimal-exact
  * (events.value is 2-dp, so Σx at scale 2, Σx² at 4 and Σx³ at 6
  * are EXACT; Σx⁴ at scale 4 stays under the 2^53 cross-engine cast
  * bound — see [[graft.util.Stable]]'s scale rule), and every central
  * moment is the same textual IEEE chain in both engines.
  *
  * Shape: ONE map-side-combinable aggregate over the fact table to a
  * 1-row five-moment frame; the statistic is single-row arithmetic —
  * one scan at any scale.
  */
object JarqueBera {

  private def dec(scale: Int) = DecimalType(30, scale)

  // shared textual chains — identical strings run in Spark and DuckDB
  private val MuChain = "s1 / CAST(n AS DOUBLE)"
  private val M2Chain = "s2 / CAST(n AS DOUBLE) - mu * mu"
  private val M3Chain =
    "s3 / CAST(n AS DOUBLE) - 3.0 * mu * (s2 / CAST(n AS DOUBLE)) + 2.0 * mu * mu * mu"
  private val M4Chain =
    "s4 / CAST(n AS DOUBLE) - 4.0 * mu * (s3 / CAST(n AS DOUBLE)) " +
      "+ 6.0 * mu * mu * (s2 / CAST(n AS DOUBLE)) - 3.0 * mu * mu * mu * mu"
  private val FinChain = Seq(
    "n",
    "round(m3 / (m2 * sqrt(m2)), 6) AS skewness",
    "round(m4 / (m2 * m2) - 3.0, 6) AS ex_kurtosis",
    "round(CAST(n AS DOUBLE) / 6.0 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2))) " +
      "+ (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0), 6) AS jb",
  )

  private val q = Q(
    "a88_jarque_bera",
    (s, d) =>
      Tables(s, d).events
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec(2))).cast("double").as("s1"),
          sum((col("value") * col("value")).cast(dec(4)))
            .cast("double").as("s2"),
          sum((col("value") * col("value") * col("value")).cast(dec(6)))
            .cast("double").as("s3"),
          sum((col("value") * col("value") * col("value") * col("value"))
            .cast(dec(4))).cast("double").as("s4"))
        .withColumn("mu", expr(MuChain))
        .withColumn("m2", expr(M2Chain))
        .withColumn("m3", expr(M3Chain))
        .withColumn("m4", expr(M4Chain))
        .selectExpr(FinChain: _*),
    Some(
      s"""WITH sums AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS s1,
         |    CAST(sum(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE) AS s2,
         |    CAST(sum(CAST(value * value * value AS DECIMAL(30,6))) AS DOUBLE) AS s3,
         |    CAST(sum(CAST(value * value * value * value AS DECIMAL(30,4))) AS DOUBLE) AS s4
         |  FROM events),
         |m0 AS (SELECT *, $MuChain AS mu FROM sums),
         |m1 AS (SELECT *, $M2Chain AS m2, $M3Chain AS m3, $M4Chain AS m4 FROM m0)
         |SELECT ${FinChain.mkString(", ")} FROM m1""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
