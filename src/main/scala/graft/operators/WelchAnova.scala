package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._

/** Welch's one-way ANOVA — a34's unequal-variance two-sample test
  * generalised to k groups (order priorities over order value):
  *
  *   W = Σ wⱼ,  x̄̃ = Σ wⱼx̄ⱼ / W,  wⱼ = nⱼ/s²ⱼ
  *   A = Σ wⱼ (x̄ⱼ − x̄̃)²
  *   Λ = Σ (1 − wⱼ/W)² / (nⱼ − 1)
  *   F = (A/(k−1)) / (1 + 2(k−2)/(k²−1)·Λ),  df₂ = (k²−1)/(3Λ)
  *
  * Per-group moments are decimal-exact (n, Σx, Σx² at 2 dp); every
  * per-group double (mean, variance, weight) is then a fixed IEEE
  * chain, and the three k-row reductions (W, weighted mean, A, Λ)
  * go through the decimal-stable cast so group order can't move
  * the statistic.
  *
  * Shape: ONE fact aggregate to k rows; a 1-row weighted-mean frame
  * broadcast back over the k rows; the finale on one row.
  */
object WelchAnova {

  private val K = 5

  private val q = Q(
    "a83_welch_anova",
    (s, d) => {
      val g = Tables(s, d).orders
        .groupBy(col("o_orderpriority").as("grp"))
        .agg(count(lit(1)).as("n"),
          Stable.dsum(col("o_totalprice"), 2).as("sx"),
          Stable.dsum(col("o_totalprice") * col("o_totalprice"), 4)
            .as("sxx"))
        .select(col("grp"), col("n"),
          (col("sx") / col("n").cast("double")).as("m"),
          ((col("sxx") - col("sx") * col("sx") /
            col("n").cast("double")) /
            (col("n") - 1).cast("double")).as("v"))
        .withColumn("w", col("n").cast("double") / col("v"))
      val tot = g.agg(Stable.dsum(col("w"), 18).as("bw"),
        Stable.dsum(col("w") * col("m"), 12).as("bwm"))
        .select(col("bw"), (col("bwm") / col("bw")).as("mw"))
      val fin = g.crossJoin(broadcast(tot)).agg(
        Stable.dsum(col("w") * (col("m") - col("mw")) *
          (col("m") - col("mw")), 12).as("a"),
        Stable.dsum((lit(1.0) - col("w") / col("bw")) *
          (lit(1.0) - col("w") / col("bw")) /
          (col("n") - 1).cast("double"), 18).as("lam"))
      fin.select(lit(K.toLong).as("k"), lit(K - 1L).as("df1"),
        round(lit((K * K - 1).toDouble) / (lit(3.0) * col("lam")), 6)
          .as("df2"),
        round((col("a") / lit((K - 1).toDouble)) /
          (lit(1.0) + lit(2.0 * (K - 2) / (K * K - 1.0)) * col("lam")),
          6).as("f_stat"))
    },
    Some {
      val twoC = 2.0 * (K - 2) / (K * K - 1.0)
      s"""WITH g AS (
         |  SELECT o_orderpriority AS grp, count(*) AS n,
         |    ${Stable.dsumSql("o_totalprice", 2)} AS sx,
         |    ${Stable.dsumSql("o_totalprice * o_totalprice", 4)} AS sxx
         |  FROM orders GROUP BY 1),
         |gm AS (
         |  SELECT grp, n, sx / CAST(n AS DOUBLE) AS m,
         |    (sxx - sx * sx / CAST(n AS DOUBLE))
         |      / CAST(n - 1 AS DOUBLE) AS v
         |  FROM g),
         |gw AS (SELECT *, CAST(n AS DOUBLE) / v AS w FROM gm),
         |tot AS (
         |  SELECT bw, bwm / bw AS mw FROM (
         |    SELECT ${Stable.dsumSql("w", 18)} AS bw,
         |      ${Stable.dsumSql("w * m", 12)} AS bwm
         |    FROM gw) t0),
         |fin AS (
         |  SELECT
         |    ${Stable.dsumSql("w * (m - mw) * (m - mw)", 12)} AS a,
         |    ${Stable.dsumSql(
               "(1.0 - w / bw) * (1.0 - w / bw) / CAST(n - 1 AS DOUBLE)",
               18)} AS lam
         |  FROM gw CROSS JOIN tot)
         |SELECT CAST($K AS BIGINT) AS k, CAST(${K - 1} AS BIGINT) AS df1,
         |  round(CAST(${K * K - 1} AS DOUBLE) / (3.0 * lam), 6) AS df2,
         |  round((a / CAST(${K - 1} AS DOUBLE))
         |    / (1.0 + CAST($twoC AS DOUBLE) * lam), 6) AS f_stat
         |FROM fin""".stripMargin
    },
  )

  def all: Seq[Q] = Seq(q)
}
