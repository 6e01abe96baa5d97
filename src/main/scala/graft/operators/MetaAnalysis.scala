package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-effect meta-analysis across segments — the pooling step a
  * segmented experiment needs AFTER a95's per-segment tests: each
  * event type yields its own treatment effect dᵢ (arm mean diff)
  * with variance vᵢ; the inverse-variance pooled effect
  *
  *   d̂ = Σwᵢdᵢ / Σwᵢ,  w = 1/v,  SE = 1/√Σw
  *
  * plus Cochran's heterogeneity Q = Σwᵢ(dᵢ−d̂)² and
  * I² = max(0, (Q−(k−1))/Q) — the statistic that says whether one
  * pooled number is even meaningful or the segments genuinely differ
  * (a72's DiD assumes they don't; this row checks).
  *
  * Per-segment moments are decimal-exact conditional sums in ONE
  * fact aggregate (both arms, all segments, one pass); the w/d/Q
  * reductions fold decimal-stable over k rows (w ~1e-2 → scale 15;
  * wd ~1 → scale 9 per the Stable rule).
  *
  * Shape: ONE fact agg to k segment rows → k-row reductions → 1-row
  * finale. One scan at any scale.
  */
object MetaAnalysis {

  private val DChain = "s1x / CAST(n1 AS DOUBLE) - s0x / CAST(n0 AS DOUBLE)"
  private val VChain =
    "((s0xx - s0x * s0x / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE) " +
      "+ ((s1xx - s1x * s1x / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)"

  private val q = Q(
    "a100_meta_analysis",
    (s, d) => {
      val g = Tables(s, d).events
        .select(col("event_type"), (col("user_id") % 2).as("arm"),
          col("value"))
        .groupBy("event_type")
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
        .withColumn("di", expr(DChain))
        .withColumn("vi", expr(VChain))
      val red = g.agg(count(lit(1)).as("k"),
        Stable.dsum(lit(1.0) / col("vi"), 15).as("sw"),
        Stable.dsum(col("di") / col("vi"), 9).as("swd"),
        Stable.dsum(col("di") * col("di") / col("vi"), 9).as("swdd"))
      red.selectExpr("k",
        "round(swd / sw, 6) AS pooled_effect",
        "round(1.0 / sqrt(sw), 6) AS pooled_se",
        "round(swdd - swd * swd / sw, 6) AS q_het",
        "round(greatest(0.0, ((swdd - swd * swd / sw) - CAST(k - 1 AS DOUBLE)) / (swdd - swd * swd / sw)), 6) AS i2")
    },
    Some(
      s"""WITH g AS (
         |  SELECT event_type,
         |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CAST(CASE WHEN user_id % 2 = 0 THEN value ELSE 0.0 END AS DECIMAL(30,2))) AS DOUBLE) AS s0x,
         |    CAST(sum(CAST(CASE WHEN user_id % 2 = 1 THEN value ELSE 0.0 END AS DECIMAL(30,2))) AS DOUBLE) AS s1x,
         |    CAST(sum(CAST(CASE WHEN user_id % 2 = 0 THEN value * value ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE) AS s0xx,
         |    CAST(sum(CAST(CASE WHEN user_id % 2 = 1 THEN value * value ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE) AS s1xx
         |  FROM events GROUP BY 1),
         |fit AS (SELECT *, $DChain AS di, $VChain AS vi FROM g),
         |red AS (
         |  SELECT count(*) AS k,
         |    ${Stable.dsumSql("1.0 / vi", 15)} AS sw,
         |    ${Stable.dsumSql("di / vi", 9)} AS swd,
         |    ${Stable.dsumSql("di * di / vi", 9)} AS swdd
         |  FROM fit)
         |SELECT k,
         |  round(swd / sw, 6) AS pooled_effect,
         |  round(1.0 / sqrt(sw), 6) AS pooled_se,
         |  round(swdd - swd * swd / sw, 6) AS q_het,
         |  round(greatest(0.0, ((swdd - swd * swd / sw) - CAST(k - 1 AS DOUBLE)) / (swdd - swd * swd / sw)), 6) AS i2
         |FROM red""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
