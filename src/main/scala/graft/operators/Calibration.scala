package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calibration audit (reliability table + the exact pieces of Expected
  * Calibration Error) — the model-evaluation row beside `a47`'s lift
  * and `sim_ndcg_at_k`'s ranking quality: bucket predictions by
  * confidence, compare each bucket's claimed confidence to its
  * realised outcome rate. Confidence here is the exact rank rational
  * cum/n of the score (a perfectly calibrated model for a monotone
  * outcome — so the interesting signal is where the outcome ISN'T
  * monotone in the score). Every emitted column is exact integer
  * algebra: the bucket gap |acc − conf| is |n·Σy − Σcum| over the
  * common denominator n_b·n, so ECE = Σ gap_num / (n·N) needs no float
  * sums anywhere.
  *
  * Shape: the OrderStats count-table layout (value-keyed agg +
  * cumulative window over distinct values) joined back onto rows by
  * value, then one 10-row bucket aggregate.
  */
object Calibration {

  val Bins = 10

  private val q = Q(
    "a53_calibration_ece",
    (s, d) => {
      val o = Tables(s, d).orders.select(
        col("o_totalprice").as("score"),
        (col("o_orderpriority") === "1-URGENT").cast("long").as("y"))
      val counts = o.groupBy("score").agg(count(lit(1)).as("c"))
      val w = Window.orderBy("score")
      val ranked = counts
        .withColumn("cum", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      val n = o.agg(count(lit(1)).as("n"))
      val joined = o.join(ranked.select("score", "cum"), "score")
        .crossJoin(broadcast(n))
        // bin = ⌈Bins·cum/n⌉ − 1 ∈ [0, Bins): exact integer algebra
        .withColumn("bin",
          expr(s"($Bins * cum + n - 1) div n") - 1L)
      joined.groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum(col("y")).as("pos"),
          sum(col("cum")).as("sum_cum"), max(col("n")).as("n"))
        .withColumn("gap_num",
          abs(col("n") * col("pos") - col("sum_cum")))
        .withColumn("gap",
          round(col("gap_num").cast("double") /
            (col("n_b") * col("n")).cast("double"), 6))
    },
    Some(
      s"""WITH o AS (
         |  SELECT o_totalprice AS score,
         |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
         |      AS y
         |  FROM orders),
         |counts AS (SELECT score, count(*) AS c FROM o GROUP BY 1),
         |ranked AS (
         |  SELECT score,
         |    CAST(sum(c) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM counts),
         |n AS (SELECT count(*) AS n FROM o),
         |j AS (
         |  SELECT o.y, r.cum, n.n,
         |    ($Bins * r.cum + n.n - 1) // n.n - 1 AS bin
         |  FROM o JOIN ranked r ON o.score = r.score CROSS JOIN n)
         |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_b,
         |  CAST(sum(y) AS BIGINT) AS pos,
         |  CAST(sum(cum) AS BIGINT) AS sum_cum,
         |  max(n) AS n,
         |  CAST(abs(max(n) * sum(y) - sum(cum)) AS BIGINT) AS gap_num,
         |  round(CAST(abs(max(n) * sum(y) - sum(cum)) AS DOUBLE)
         |    / CAST(count(*) * max(n) AS DOUBLE), 6) AS gap
         |FROM j GROUP BY 1""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
