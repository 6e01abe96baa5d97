package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Wilson score interval for grouped proportions — the uncertainty
  * band every published rate (conversion, defect share, filter pass
  * rate) should ship with. Wilson rather than the Wald ±z√(p̂q̂/n)
  * taught in intro stats: Wald collapses to zero width at p̂ ∈ {0, 1}
  * and undercovers at small n — exactly the regimes a per-group rollup
  * hits (a 3-row group with 3 successes gets Wald [1, 1], Wilson a
  * properly humble [0.44, 1]). Complements `a34_ab_welch` (mean
  * differences) and `a36_poisson_bootstrap_ci` (resampled totals) with
  * the closed-form proportion case.
  *
  * Determinism: k and n are exact integers from one map-side-combined
  * aggregate; the interval is a FIXED chain of IEEE ops mirrored
  * token-for-token in the oracle — z² is always written `1.96 * 1.96`
  * (the double product), never the decimal literal `3.8416`, which is
  * a DIFFERENT double and the classic parity trap.
  */
object WilsonCi {

  private val wilson = Q(
    "a41_wilson_proportion_ci",
    (s, d) => {
      val o = Tables(s, d).orders
      val z = lit(1.96)
      val agg = o.groupBy("o_orderpriority")
        .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
          .as("k"), count(lit(1)).as("n"))
      val nd = col("n").cast("double")
      val ph = col("k").cast("double") / nd
      val z2 = z * z
      val denom = lit(1.0) + z2 / nd
      val center = ph + z2 / (lit(2.0) * nd)
      val rad = z * sqrt((ph * (lit(1.0) - ph)) / nd +
        z2 / (lit(4.0) * nd * nd))
      agg.select(col("o_orderpriority"), col("k"), col("n"),
        ph.as("p_hat"),
        ((center - rad) / denom).as("ci_low"),
        ((center + rad) / denom).as("ci_high"))
    },
    // NOTE the z cast in the oracle: a bare `1.96` literal is DECIMAL in
    // DuckDB, and decimal 1.96² = 3.8416 exactly — a DIFFERENT number
    // from double(1.96)², which is what Spark computes. Forcing the
    // literal to DOUBLE once in the CTE keeps every later product IEEE.
    Some(
      """WITH a AS (
        |  SELECT o_orderpriority,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k,
        |    count(*) AS n
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT o_orderpriority, k, n,
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(1.96 AS DOUBLE) AS z
        |  FROM a)
        |SELECT o_orderpriority, k, n, ph AS p_hat,
        |  ((ph + (z * z) / (2.0 * nd))
        |    - z * sqrt((ph * (1.0 - ph)) / nd
        |               + (z * z) / (4.0 * nd * nd)))
        |   / (1.0 + (z * z) / nd) AS ci_low,
        |  ((ph + (z * z) / (2.0 * nd))
        |    + z * sqrt((ph * (1.0 - ph)) / nd
        |               + (z * z) / (4.0 * nd * nd)))
        |   / (1.0 + (z * z) / nd) AS ci_high
        |FROM c""".stripMargin),
  )

  def queries: Seq[Q] = Seq(wilson)
}
