package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Friedman test — the within-block rank test completing the
  * nonparametric family: a54 compares two independent samples, a55
  * k independent samples; Friedman asks the REPEATED-measures
  * question "do the k treatments differ once every block acts as
  * its own control". Blocks = calendar months, treatments = order
  * priority, observation = the month×priority order count.
  *
  * EXACT throughout, via the a50/a54 doubled-midrank trick kept
  * within each block: r2 = 2·rank + ties − 1 is integral, so the
  * tie-corrected Conover statistic
  *
  *   T = (k−1) · Σ_j (R_j − b(k+1)/2)² / (A − C),
  *   A = Σ_bj r_bj²,  C = b·k·(k+1)²/4
  *
  * becomes, with everything doubled (numerator ×4 over A4−C4 = ×4),
  * pure BIGINT until one final IEEE divide. Incomplete blocks
  * (months missing a priority) are excluded exactly as the
  * textbook test requires.
  *
  * Shape: the fact table collapses to the |months|×k cell grid in
  * ONE aggregate; ranks, treatment sums and the statistic all run
  * on cells (hundreds of rows), never on facts.
  */
object Friedman {

  private val q = Q(
    "a74_friedman_test",
    (s, d) => {
      val cells = Tables(s, d).orders
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("blk"),
          col("o_orderpriority").as("trt"))
        .agg(count(lit(1)).as("y"))
      val complete = cells
        .withColumn("k_in_blk", count(lit(1)).over(
          Window.partitionBy("blk")))
      val k = 5
      val wb = Window.partitionBy("blk").orderBy("y")
      val ranked = complete.filter(col("k_in_blk") === k)
        .withColumn("ties", count(lit(1)).over(
          Window.partitionBy("blk", "y")))
        .withColumn("r2",
          lit(2L) * rank().over(wb) + col("ties") - 1L)
      val perTrt = ranked.groupBy("trt")
        .agg(sum(col("r2")).as("r2_sum"),
          sum(col("r2") * col("r2")).as("r2_sq"),
          countDistinct(col("blk")).as("b"))
      perTrt
        .agg(sum(col("r2_sq")).as("a4"), max(col("b")).as("b"),
          sum((col("r2_sum") - col("b") * (k + 1)) *
            (col("r2_sum") - col("b") * (k + 1))).as("num"))
        .select(col("b").as("n_blocks"), lit(k.toLong).as("k"),
          (col("a4") - col("b") * k * (k + 1) * (k + 1)).as("denom4"),
          round(lit((k - 1).toDouble) * col("num").cast("double") /
            (col("a4") - col("b") * k * (k + 1) * (k + 1))
              .cast("double"), 6).as("chi2_f"))
    },
    Some(
      """WITH cells AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS blk,
        |    o_orderpriority AS trt, count(*) AS y
        |  FROM orders GROUP BY 1, 2),
        |complete AS (
        |  SELECT *, count(*) OVER (PARTITION BY blk) AS k_in_blk
        |  FROM cells),
        |ranked AS (
        |  SELECT trt, blk,
        |    2 * rank() OVER (PARTITION BY blk ORDER BY y)
        |      + count(*) OVER (PARTITION BY blk, y) - 1 AS r2
        |  FROM complete WHERE k_in_blk = 5),
        |per_trt AS (
        |  SELECT trt, CAST(sum(r2) AS BIGINT) AS r2_sum,
        |    CAST(sum(r2 * r2) AS BIGINT) AS r2_sq,
        |    count(DISTINCT blk) AS b
        |  FROM ranked GROUP BY 1),
        |agg AS (
        |  SELECT CAST(sum(r2_sq) AS BIGINT) AS a4,
        |    CAST(max(b) AS BIGINT) AS b,
        |    CAST(sum((r2_sum - b * 6) * (r2_sum - b * 6)) AS BIGINT)
        |      AS num
        |  FROM per_trt)
        |SELECT b AS n_blocks, CAST(5 AS BIGINT) AS k,
        |  CAST(a4 - b * 5 * 6 * 6 AS BIGINT) AS denom4,
        |  round(4.0 * CAST(num AS DOUBLE)
        |    / CAST(a4 - b * 5 * 6 * 6 AS DOUBLE), 6) AS chi2_f
        |FROM agg""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
