package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Benjamini–Hochberg FDR over a family of per-group z-tests — the
  * missing piece every multi-segment dashboard needs: a85/a34 run ONE
  * test; a dashboard runs one per segment and the naive 0.05 gate
  * then false-alarms at 1−0.95^k. Each event type is tested against
  * the global mean value (z from exact decimal moments), two-sided
  * p-values come from a NORMAL CDF EVALUATED AS A POLYNOMIAL
  * (Abramowitz–Stegun 26.2.17, |err| < 7.5e-8) — there is no erf in
  * either engine, but a fixed polynomial is one IEEE chain and
  * therefore bit-identical in both — and the BH adjustment
  * p̃₍ᵢ₎ = min_{j≥i} p₍ⱼ₎·k/j runs as a running-min window over the
  * k-row frame.
  *
  * Shape: ONE fact aggregate to k=|event_type| rows, a 1-row global
  * broadcast, then windows on k rows. One scan at any scale.
  */
object MultipleTesting {

  /** A&S 26.2.17 upper-tail Q(z) for z ≥ 0, as a SQL text chain over
    * a column named `az` (= |z|). Identical string runs in Spark and
    * DuckDB; every constant is a shared decimal literal. Shared with
    * every row that needs a normal CDF (e_bayes_ab_normal).
    */
  private[operators] val QTail =
    "exp(-az * az / 2.0) * CAST(0.3989422804014327 AS DOUBLE) * " +
      "((((1.330274429 * (1.0 / (1.0 + 0.2316419 * az)) - 1.821255978) " +
      "* (1.0 / (1.0 + 0.2316419 * az)) + 1.781477937) " +
      "* (1.0 / (1.0 + 0.2316419 * az)) - 0.356563782) " +
      "* (1.0 / (1.0 + 0.2316419 * az)) + 0.319381530) " +
      "* (1.0 / (1.0 + 0.2316419 * az))"

  private val q = Q(
    "a95_multiple_testing_fdr",
    (s, d) => {
      val g = Tables(s, d).events
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(30, 2)))
            .cast("double").as("sx"))
        .localCheckpoint(false)
      val glob = Tables(s, d).events
        .agg(count(lit(1)).as("nn"),
          sum(col("value").cast(DecimalType(30, 2)))
            .cast("double").as("gsx"),
          sum((col("value") * col("value")).cast(DecimalType(30, 4)))
            .cast("double").as("gsxx"))
        .withColumn("mu", expr("gsx / CAST(nn AS DOUBLE)"))
        .withColumn("sigma", expr(
          "sqrt((gsxx - gsx * gsx / CAST(nn AS DOUBLE)) / (CAST(nn AS DOUBLE) - 1.0))"))
        .select("mu", "sigma")
      val k = g.agg(count(lit(1)).as("k"))
      val z = g.crossJoin(broadcast(glob)).crossJoin(broadcast(k))
        .withColumn("z", expr(
          "(sx / CAST(n AS DOUBLE) - mu) * sqrt(CAST(n AS DOUBLE)) / sigma"))
        .withColumn("az", abs(col("z")))
        .withColumn("p", expr(s"2.0 * ($QTail)"))
      val wRank = Window.orderBy("p", "event_type")
      val wMin = Window.orderBy(desc("p"), desc("event_type"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      z.withColumn("i", row_number().over(wRank))
        .withColumn("p_bh", least(lit(1.0),
          min(col("p") * col("k").cast("double") / col("i").cast("double"))
            .over(wMin)))
        .select(col("event_type"), round(col("z"), 6).as("z"),
          round(col("p"), 9).as("p"),
          round(col("p_bh"), 9).as("p_bh"),
          (col("p_bh") < 0.05).as("reject_fdr05"))
    },
    Some(
      s"""WITH g AS (
         |  SELECT event_type, count(*) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sx
         |  FROM events GROUP BY 1),
         |gstats AS (
         |  SELECT count(*) AS nn,
         |    CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS gsx,
         |    CAST(sum(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE) AS gsxx
         |  FROM events),
         |gstats2 AS (
         |  SELECT gsx / CAST(nn AS DOUBLE) AS mu,
         |    sqrt((gsxx - gsx * gsx / CAST(nn AS DOUBLE)) / (CAST(nn AS DOUBLE) - 1.0)) AS sigma
         |  FROM gstats),
         |kk AS (SELECT count(*) AS k FROM g),
         |z0 AS (
         |  SELECT event_type, n, k,
         |    (sx / CAST(n AS DOUBLE) - mu) * sqrt(CAST(n AS DOUBLE)) / sigma AS z
         |  FROM g CROSS JOIN gstats2 CROSS JOIN kk),
         |z1 AS (SELECT *, abs(z) AS az FROM z0),
         |z2 AS (SELECT *, 2.0 * ($QTail) AS p FROM z1),
         |ranked AS (
         |  SELECT *, row_number() OVER (ORDER BY p, event_type) AS i
         |  FROM z2),
         |adj AS (
         |  SELECT *, least(1.0,
         |    min(p * CAST(k AS DOUBLE) / CAST(i AS DOUBLE))
         |      OVER (ORDER BY p DESC, event_type DESC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_bh
         |  FROM ranked)
         |SELECT event_type, round(z, 6) AS z, round(p, 9) AS p,
         |  round(p_bh, 9) AS p_bh, p_bh < 0.05 AS reject_fdr05
         |FROM adj""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
