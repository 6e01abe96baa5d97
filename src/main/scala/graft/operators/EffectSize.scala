package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Standardised effect size for the two-arm experiment — Cohen's d
  * with Hedges' small-sample correction: a34's Welch t says whether
  * the arms differ; d/g say by HOW MUCH in pooled-sd units (the
  * number a meta-analysis or an MDE sanity check actually consumes):
  *
  *   d = (x̄₁ − x̄₀)/s_p,   s_p² = ((n₀−1)s₀² + (n₁−1)s₁²)/(n₀+n₁−2)
  *   g = J·d,  J = 1 − 3/(4(n₀+n₁−2) − 1)
  *
  * Per-arm Σx/Σx² are decimal-exact (2-dp values), the d/g chain is
  * one fixed IEEE sequence on the 2-row frame.
  *
  * Shape: ONE conditional aggregate over the fact scan (both arms in
  * one pass, no per-arm scans) to a 1-row frame. One scan at any
  * scale.
  */
object EffectSize {

  private val fin = Seq(
    "n0", "n1",
    "round((s1x / CAST(n1 AS DOUBLE) - s0x / CAST(n0 AS DOUBLE)) / sp, 6) AS cohens_d",
    "round((1.0 - 3.0 / (4.0 * CAST(n0 + n1 - 2 AS DOUBLE) - 1.0)) " +
      "* (s1x / CAST(n1 AS DOUBLE) - s0x / CAST(n0 AS DOUBLE)) / sp, 6) AS hedges_g",
    "round(sp, 6) AS pooled_sd",
  )
  private val SpChain =
    "sqrt(((s0xx - s0x * s0x / CAST(n0 AS DOUBLE)) " +
      "+ (s1xx - s1x * s1x / CAST(n1 AS DOUBLE))) / CAST(n0 + n1 - 2 AS DOUBLE))"

  private val q = Q(
    "a93_effect_size",
    (s, d) =>
      Tables(s, d).events
        .select((col("user_id") % 2).as("arm"), col("value"))
        .agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("value")).otherwise(0.0)
            .cast(DecimalType(30, 2))).cast("double").as("s0x"),
          sum(when(col("arm") === 1, col("value")).otherwise(0.0)
            .cast(DecimalType(30, 2))).cast("double").as("s1x"),
          sum(when(col("arm") === 0, col("value") * col("value"))
            .otherwise(0.0).cast(DecimalType(30, 4))).cast("double")
            .as("s0xx"),
          sum(when(col("arm") === 1, col("value") * col("value"))
            .otherwise(0.0).cast(DecimalType(30, 4))).cast("double")
            .as("s1xx"))
        .withColumn("sp", expr(SpChain))
        .selectExpr(fin: _*),
    Some(
      s"""WITH red AS (
         |  SELECT
         |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CAST(CASE WHEN user_id % 2 = 0 THEN value ELSE 0.0 END AS DECIMAL(30,2))) AS DOUBLE) AS s0x,
         |    CAST(sum(CAST(CASE WHEN user_id % 2 = 1 THEN value ELSE 0.0 END AS DECIMAL(30,2))) AS DOUBLE) AS s1x,
         |    CAST(sum(CAST(CASE WHEN user_id % 2 = 0 THEN value * value ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE) AS s0xx,
         |    CAST(sum(CAST(CASE WHEN user_id % 2 = 1 THEN value * value ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE) AS s1xx
         |  FROM events),
         |fit AS (SELECT *, $SpChain AS sp FROM red)
         |SELECT ${fin.mkString(", ")} FROM fit""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
