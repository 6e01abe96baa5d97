package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ABC / Pareto classification — rank entities by revenue, accumulate
  * the running share, cut at 80% (A), 95% (B), rest C. The inventory /
  * catalog-curation rollup behind "which 20% of parts carry 80% of
  * spend"; in a corpus setting the same operator answers "which sources
  * carry 95% of tokens" (`t_source_gini` measures the skew, this NAMES
  * the heads).
  *
  * Exactness: revenue totals and the running cumulative both stay
  * DECIMAL (the running sum is a window over already-exact per-key
  * totals, so no float ever accumulates), and the class cut compares
  * exact decimals against exact decimal thresholds — 100·cum ≤ 80·total
  * in integer-like decimal algebra, no percentage division anywhere.
  * Tie discipline: ordering is (revenue DESC, key ASC) — unique, so the
  * running sum and the classes are deterministic under any
  * partitioning.
  *
  * Scale: one map-side-combined aggregate to per-key totals, then ONE
  * global window over |keys| rows. The window is the honest cost of an
  * exact global Pareto ranking; if |keys| itself outgrew a node you'd
  * range-partition the sort (Spark's window already sorts distributed)
  * — the frame stays |keys|-sized, never row-sized.
  */
object Pareto {

  private val dec = DecimalType(30, 4)

  private val abc = Q(
    "a43_abc_pareto",
    (s, d) => {
      val li = Tables(s, d).lineitem
      val perPart = li.groupBy("l_partkey")
        .agg(sum(col("l_extendedprice").cast(dec)).as("revenue"))
      val w = Window.orderBy(desc("revenue"), asc("l_partkey"))
      val total = perPart.agg(sum(col("revenue")).as("total"))
      perPart
        .withColumn("cum", sum(col("revenue")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rank", row_number().over(w))
        .crossJoin(broadcast(total))
        .select(col("l_partkey"), col("rank"),
          col("revenue").cast("double").as("revenue"),
          col("cum").cast("double").as("cum_revenue"),
          when(col("cum") * 100 <= col("total") * 80, "A")
            .when(col("cum") * 100 <= col("total") * 95, "B")
            .otherwise("C").as("abc_class"))
    },
    Some(
      """WITH p AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS revenue
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(revenue) AS total FROM p),
        |c AS (
        |  SELECT l_partkey, revenue,
        |    CAST(row_number() OVER w AS INT) AS rank,
        |    sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM p WINDOW w AS (ORDER BY revenue DESC, l_partkey))
        |SELECT c.l_partkey, c.rank,
        |  CAST(c.revenue AS DOUBLE) AS revenue,
        |  CAST(c.cum AS DOUBLE) AS cum_revenue,
        |  CASE WHEN c.cum * 100 <= t.total * 80 THEN 'A'
        |       WHEN c.cum * 100 <= t.total * 95 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM c CROSS JOIN t""".stripMargin),
  )

  def queries: Seq[Q] = Seq(abc)
}
