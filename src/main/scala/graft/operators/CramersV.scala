package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Cramér's V — the effect-size companion to a42's χ² independence
  * test: χ² says WHETHER market segment and order priority are
  * associated, V says HOW STRONGLY on the comparable [0,1] scale,
  *
  *   V = √( χ² / (N · min(r−1, c−1)) ).
  *
  * EXACT construction: with observed o_ij and margins r_i, c_j, each
  * χ² term is written (N·o − r·c)² / (N·r·c) so numerator and
  * denominator stay BIGINT; the per-cell IEEE divides are summed
  * through the decimal-stable cast (order-independent), and the two
  * final operations (÷, √) are single correctly-rounded IEEE steps.
  *
  * Shape: customer broadcast-joins into orders, ONE aggregate builds
  * the 5×5 grid, margins ride |grid|-row windows — the statistic
  * costs one fact scan at any scale.
  */
object CramersV {

  private val q = Q(
    "a76_cramers_v",
    (s, d) => {
      val t = Tables(s, d)
      val grid = t.orders
        .join(broadcast(t.customer),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("o"))
      val w = org.apache.spark.sql.expressions.Window
      val withMargins = grid
        .withColumn("r", sum(col("o")).over(w.partitionBy("seg")))
        .withColumn("c", sum(col("o")).over(w.partitionBy("pri")))
        .withColumn("n", sum(col("o")).over(w.partitionBy()))
      val term = (col("n") * col("o") - col("r") * col("c"))
        .cast("double") * (col("n") * col("o") - col("r") * col("c"))
        .cast("double") /
        (col("n") * col("r") * col("c")).cast("double")
      withMargins
        .agg(max(col("n")).as("n"),
          countDistinct(col("seg")).as("rr"),
          countDistinct(col("pri")).as("cc"),
          graft.util.Stable.dsum(term, 12).as("chi2"))
        .select(col("n"),
          ((col("rr") - 1) * (col("cc") - 1)).as("df"),
          round(col("chi2"), 6).as("chi2"),
          round(sqrt(col("chi2") /
            (col("n") * least(col("rr"), col("cc")) - col("n"))
              .cast("double")), 6).as("cramers_v"))
    },
    Some {
      val term = "CAST((n * o - r * c) AS DOUBLE)" +
        " * CAST((n * o - r * c) AS DOUBLE)" +
        " / CAST(n * r * c AS DOUBLE)"
      s"""WITH grid AS (
         |  SELECT c_mktsegment AS seg, o_orderpriority AS pri,
         |    count(*) AS o
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |m AS (
         |  SELECT seg, pri, o,
         |    CAST(sum(o) OVER (PARTITION BY seg) AS BIGINT) AS r,
         |    CAST(sum(o) OVER (PARTITION BY pri) AS BIGINT) AS c,
         |    CAST(sum(o) OVER () AS BIGINT) AS n
         |  FROM grid),
         |agg AS (
         |  SELECT max(n) AS n, count(DISTINCT seg) AS rr,
         |    count(DISTINCT pri) AS cc,
         |    ${graft.util.Stable.dsumSql(term, 12)} AS chi2
         |  FROM m)
         |SELECT n, CAST((rr - 1) * (cc - 1) AS BIGINT) AS df,
         |  round(chi2, 6) AS chi2,
         |  round(sqrt(chi2 / CAST(n * least(rr, cc) - n AS DOUBLE)), 6)
         |    AS cramers_v
         |FROM agg""".stripMargin
    },
  )

  def all: Seq[Q] = Seq(q)
}
