package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov distance — the distribution-shift
  * test beside `a34_ab_welch`'s mean test and `t_corpus_drift`'s
  * binned divergence: D = sup |F₁(x) − F₂(x)| over the pooled sample,
  * sensitive to ANY distributional difference, not just location.
  *
  * EXACT, no floats until display: at each distinct pooled value the
  * ECDF gap is |c₁·n₂ − c₂·n₁| / (n₁·n₂), so the argmax is decided on
  * the BIGINT numerator alone. One value-keyed agg (map-side
  * combined), one cumulative window over the ≤ |distinct values| rows,
  * one max — the same two-phase shape as a43's Pareto cut. Groups:
  * high- vs low-priority order values.
  */
object KsTest {

  private val q = Q(
    "a49_ks_test",
    (s, d) => {
      val o = Tables(s, d).orders
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_totalprice").as("v"),
          (col("o_orderpriority") === "1-URGENT").cast("long").as("g1"))
      val byVal = o.groupBy("v")
        .agg(sum(col("g1")).as("a1"),
          sum(lit(1L) - col("g1")).as("a2"))
      val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
      val cum = byVal
        .withColumn("c1", sum(col("a1")).over(w))
        .withColumn("c2", sum(col("a2")).over(w))
      val tot = o.agg(sum(col("g1")).as("n1"),
        sum(lit(1L) - col("g1")).as("n2"))
      cum.crossJoin(broadcast(tot))
        .select(col("v"), col("c1"), col("c2"), col("n1"), col("n2"),
          abs(col("c1") * col("n2") - col("c2") * col("n1")).as("gap_num"))
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          max(col("gap_num")).as("d_num"))
        .select(col("n1"), col("n2"), col("d_num"),
          round(col("d_num").cast("double") /
            (col("n1") * col("n2")).cast("double"), 6).as("d_stat"))
    },
    Some(
      """WITH o AS (
        |  SELECT o_totalprice AS v,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |byval AS (
        |  SELECT v, CAST(sum(g1) AS BIGINT) AS a1,
        |    CAST(sum(1 - g1) AS BIGINT) AS a2
        |  FROM o GROUP BY 1),
        |cum AS (
        |  SELECT v,
        |    CAST(sum(a1) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS c1,
        |    CAST(sum(a2) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS c2
        |  FROM byval),
        |tot AS (SELECT CAST(sum(g1) AS BIGINT) AS n1,
        |  CAST(sum(1 - g1) AS BIGINT) AS n2 FROM o)
        |SELECT tot.n1, tot.n2,
        |  CAST(max(abs(c1 * tot.n2 - c2 * tot.n1)) AS BIGINT) AS d_num,
        |  round(CAST(max(abs(c1 * tot.n2 - c2 * tot.n1)) AS DOUBLE)
        |    / CAST(tot.n1 * tot.n2 AS DOUBLE), 6) AS d_stat
        |FROM cum CROSS JOIN tot
        |GROUP BY 1, 2""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
