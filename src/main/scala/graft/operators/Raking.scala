package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative proportional fitting (raking) — the survey-calibration
  * step every labour-statistics shop runs: reweight last period's
  * (region, industry) sample so its margins match this period's known
  * row/column totals (Deming & Stephan 1940). Here: the Y0 posting
  * cube raked to Y1 margins, [[Iters]] sweeps.
  *
  * Engine discipline: cell values live in micro-count units (1e6 ×
  * count) and each half-sweep multiplies by a ppm factor
  * (1e6·target div current, floor) — all operands non-negative, so
  * the whole trajectory replays as chained CTEs in DuckDB exactly
  * (the [[graft.similarity.Rank1Als]] pattern). Convergence is the
  * textbook geometric one; three sweeps are plenty for a
  * 25×6 cube and keep the SQL replay finite.
  *
  * Scale: the fact table is touched twice (Y0 cube, Y1 margins); every
  * sweep is two window sums over the |regions|·|industries| cube —
  * margins never shuffle the data. At 100 TB the cube is still tiny;
  * the raking loop cost is independent of corpus size.
  */
object Raking {

  val Ppm = 1000000L
  val Iters = 3
  val Y0 = 1997
  val Y1 = 1998

  /** One half-sweep: scale each cell so the `by`-margin of v matches
    * the target margin `tgt` (both in plain counts / micro-units).
    */
  private def sweep(cells: DataFrame, by: String): DataFrame = {
    val w = Window.partitionBy(by)
    cells
      .withColumn("cur", sum(col("v")).over(w))
      .withColumn("tgt_m", max(col(s"tgt_$by")).over(w))
      // factor_ppm = 1e6 · (1e6·target) div current-margin; cur > 0
      // because every cell starts at n0 ≥ 1 and factors stay ≥ 1 ppm
      .withColumn("f", expr(s"($Ppm * tgt_m * $Ppm) div cur"))
      .withColumn("v", expr(s"(v * f) div $Ppm"))
      .drop("cur", "tgt_m", "f")
  }

  private val q = Q(
    "a60_ipf_raking",
    (s, d) => {
      val base = RegionalShare.cells(Tables(s, d))
        .withColumn("y", year(col("l_shipdate")))
        .filter(col("y").isin(Y0, Y1))
      val cube = base.groupBy("region", "industry")
        .agg(sum(when(col("y") === Y0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("y") === Y1, 1L).otherwise(0L)).as("n1"))
        .filter(col("n0") > 0)
      val wR = Window.partitionBy("region")
      val wI = Window.partitionBy("industry")
      var cells = cube.select(col("region"), col("industry"), col("n0"),
          (col("n0") * Ppm).as("v"),
          sum(col("n1")).over(wR).as("tgt_region"),
          sum(col("n1")).over(wI).as("tgt_industry"))
        .localCheckpoint(false)
      for (_ <- 1 to Iters) {
        cells = sweep(cells, "region")
        cells = sweep(cells, "industry").localCheckpoint(false)
      }
      cells.select(col("region"), col("industry"), col("n0"),
        col("v").as("raked_units"))
    },
    Some {
      val sweeps = (1 to Iters).flatMap { t =>
        Seq(
          s"""r$t AS (
             |  SELECT region, industry, n0, tgt_region, tgt_industry,
             |    (v * (($Ppm * tgt_region * $Ppm)
             |      // CAST(sum(v) OVER (PARTITION BY region) AS BIGINT)))
             |      // $Ppm AS v
             |  FROM ${if (t == 1) "c0" else s"c${t - 1}"})""".stripMargin,
          s"""c$t AS (
             |  SELECT region, industry, n0, tgt_region, tgt_industry,
             |    (v * (($Ppm * tgt_industry * $Ppm)
             |      // CAST(sum(v) OVER (PARTITION BY industry) AS BIGINT)))
             |      // $Ppm AS v
             |  FROM r$t)""".stripMargin)
      }.mkString(",\n")
      s"""WITH cells AS (
         |  SELECT n_name AS region,
         |    str_split(p_type, ' ')[1] AS industry,
         |    EXTRACT(year FROM l_shipdate) AS y
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE EXTRACT(year FROM l_shipdate) IN ($Y0, $Y1)),
         |cube0 AS (
         |  SELECT region, industry,
         |    CAST(sum(CASE WHEN y = $Y0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n0,
         |    CAST(sum(CASE WHEN y = $Y1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1
         |  FROM cells GROUP BY 1, 2),
         |kept AS (SELECT * FROM cube0 WHERE n0 > 0),
         |c0 AS (
         |  SELECT region, industry, n0, n0 * $Ppm AS v,
         |    CAST(sum(n1) OVER (PARTITION BY region) AS BIGINT)
         |      AS tgt_region,
         |    CAST(sum(n1) OVER (PARTITION BY industry) AS BIGINT)
         |      AS tgt_industry
         |  FROM kept),
         |$sweeps
         |SELECT region, industry, n0, v AS raked_units FROM c$Iters"""
        .stripMargin
    },
  )

  def all: Seq[Q] = Seq(q)
}
