package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._

/** Population Stability Index — the scorecard-monitoring drift
  * number beside a49's KS (sup-distance) and a66's Wasserstein
  * (transport cost): per-bin contribution
  *
  *   PSI = Σ_bins (p₂ − p₁) · ln(p₂ / p₁)
  *
  * between the first and second calendar halves of the events
  * stream, over 10 fixed-width value bins. Laplace-smoothed
  * proportions ((c+1)/(n+B)) keep empty bins finite, the ln rides
  * the same IEEE-libm parity the t_llr_collocations G² established,
  * and the 10 per-bin terms are summed through the decimal-stable
  * cast so the total is order-independent.
  *
  * Shape: one 2-row min/max/midpoint aggregate broadcast into the
  * fact scan, ONE (period, bin) aggregate (≤20 rows), then
  * arithmetic. Two scans total at any scale; emits the per-bin
  * breakdown a drift dashboard needs, with the total on every row.
  */
object PsiDrift {

  private val Bins = 10

  private val q = Q(
    "a77_psi_drift",
    (s, d) => {
      val e = Tables(s, d).events
        .select(to_date(col("ts")).as("day"), col("value"))
      val bounds = e.agg(min(col("day")).as("d0"),
        max(col("day")).as("d1"), min(col("value")).as("v0"),
        max(col("value")).as("v1"))
      val binned = e.crossJoin(broadcast(bounds))
        .select(
          // integer `div`, not `/`: `/` is a double divide and the two
          // engines round the int cast differently (trunc vs nearest)
          (col("day") <= date_add(col("d0"),
            expr("cast(datediff(d1, d0) div 2 as int)"))).cast("int")
            .as("first_half"),
          least(lit(Bins - 1), floor((col("value") - col("v0")) *
            Bins / (col("v1") - col("v0"))).cast("int")).as("bin"))
      val cells = binned.groupBy("bin").agg(
        sum(col("first_half").cast("long")).as("c1"),
        sum(lit(1L) - col("first_half")).as("c2"))
      val tot = cells.agg(sum(col("c1")).as("n1"),
        sum(col("c2")).as("n2"))
      val term = cells.crossJoin(broadcast(tot))
        .withColumn("p1", (col("c1") + 1L).cast("double") /
          (col("n1") + Bins).cast("double"))
        .withColumn("p2", (col("c2") + 1L).cast("double") /
          (col("n2") + Bins).cast("double"))
        .withColumn("psi_term",
          (col("p2") - col("p1")) * log(col("p2") / col("p1")))
      term
        .withColumn("psi_total", round(sum(
          col("psi_term").cast(
            org.apache.spark.sql.types.DataTypes
              .createDecimalType(30, 12))).over(
          org.apache.spark.sql.expressions.Window.partitionBy())
          .cast("double"), 6))
        .select(col("bin"), col("c1"), col("c2"),
          round(col("psi_term"), 6).as("psi_term"),
          col("psi_total"))
        .orderBy("bin")
    },
    Some(
      s"""WITH e AS (
         |  SELECT CAST(ts AS DATE) AS day, value FROM events),
         |bounds AS (
         |  SELECT min(day) AS d0, max(day) AS d1,
         |    min(value) AS v0, max(value) AS v1 FROM e),
         |binned AS (
         |  SELECT CASE WHEN day <= d0
         |      + CAST(date_diff('day', d0, d1) // 2 AS INTEGER)
         |      THEN 1 ELSE 0 END AS first_half,
         |    least($Bins - 1, CAST(floor((value - v0) * $Bins
         |      / (v1 - v0)) AS INTEGER)) AS bin
         |  FROM e CROSS JOIN bounds),
         |cells AS (
         |  SELECT bin, CAST(sum(first_half) AS BIGINT) AS c1,
         |    CAST(sum(1 - first_half) AS BIGINT) AS c2
         |  FROM binned GROUP BY 1),
         |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
         |  CAST(sum(c2) AS BIGINT) AS n2 FROM cells),
         |term AS (
         |  SELECT bin, c1, c2,
         |    CAST(c1 + 1 AS DOUBLE) / CAST(n1 + $Bins AS DOUBLE) AS p1,
         |    CAST(c2 + 1 AS DOUBLE) / CAST(n2 + $Bins AS DOUBLE) AS p2
         |  FROM cells CROSS JOIN tot)
         |SELECT bin, c1, c2,
         |  round((p2 - p1) * ln(p2 / p1), 6) AS psi_term,
         |  round(CAST(sum(CAST((p2 - p1) * ln(p2 / p1)
         |      AS DECIMAL(30,12))) OVER () AS DOUBLE), 6) AS psi_total
         |FROM term ORDER BY bin""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
