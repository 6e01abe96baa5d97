package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric two-sample
  * test completing the comparison family: `a34` Welch compares means
  * (assumes rough normality), `a49` KS any distributional difference,
  * U asks the rank question "does one group stochastically dominate".
  * EXACT throughout: pooled tie-averaged ranks kept DOUBLED so they
  * stay integral (the a50 trick), R₁ summed as BIGINT, and
  * U₁ = R₁ − n₁(n₁+1)/2 emitted as the exact doubled integer beside
  * its halved display value (k + 0.5 is exact in binary, so the
  * divide is deterministic).
  *
  * Shape: one value-keyed count agg + one cumulative window over
  * distinct pooled values + a value join back — the count-table
  * layout shared with a49/a50/OrderStats.
  */
object MannWhitney {

  private val q = Q(
    "a54_mann_whitney",
    (s, d) => {
      val o = Tables(s, d).orders
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_totalprice").as("v"),
          (col("o_orderpriority") === "1-URGENT").cast("long").as("g1"))
      val counts = o.groupBy("v").agg(count(lit(1)).as("c"))
      val w = Window.orderBy("v")
      val rank2 = counts
        .withColumn("cum", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("v"),
          (lit(2L) * (col("cum") - col("c")) + col("c") + 1L).as("r2"))
      o.join(rank2, "v")
        .agg(sum(col("g1")).as("n1"),
          sum(lit(1L) - col("g1")).as("n2"),
          sum(col("g1") * col("r2")).as("r1_doubled"))
        .select(col("n1"), col("n2"),
          (col("r1_doubled") - col("n1") * (col("n1") + 1L))
            .as("u1_doubled"))
        .withColumn("u1", col("u1_doubled").cast("double") / 2.0)
        .withColumn("u2",
          (col("n1") * col("n2")).cast("double") - col("u1"))
    },
    Some(
      """WITH o AS (
        |  SELECT o_totalprice AS v,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        |      AS g1
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |counts AS (SELECT v, count(*) AS c FROM o GROUP BY 1),
        |rank2 AS (
        |  SELECT v,
        |    2 * (sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
        |      + c + 1 AS r2
        |  FROM counts),
        |agg AS (
        |  SELECT CAST(sum(o.g1) AS BIGINT) AS n1,
        |    CAST(sum(1 - o.g1) AS BIGINT) AS n2,
        |    CAST(sum(o.g1 * rank2.r2) AS BIGINT) AS r1_doubled
        |  FROM o JOIN rank2 ON o.v = rank2.v)
        |SELECT n1, n2,
        |  CAST(r1_doubled - n1 * (n1 + 1) AS BIGINT) AS u1_doubled,
        |  CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
        |  CAST(n1 * n2 AS DOUBLE)
        |    - CAST(r1_doubled - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u2
        |FROM agg""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
