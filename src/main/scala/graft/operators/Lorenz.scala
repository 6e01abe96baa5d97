package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lorenz curve at decile resolution — the picture a90's Gini
  * scalar summarises: L(k/10) = share of total revenue held by the
  * poorest k/10 of customers. Same SORTLESS discipline as a90: the
  * per-customer revenues collapse to exact cents strata, cumulative
  * count/revenue run over the value-range-bounded strata table, and
  * each decile boundary b_k = (k·n) div 10 is located with a
  * 10-row broadcast range join. A boundary falling INSIDE a stratum
  * is interpolated exactly: members of one stratum all hold the
  * same revenue, so L at rank b is (cumrev_before + rev·(b −
  * cumcount_before)) / total — still exact decimal arithmetic.
  *
  * Shape: customer agg → strata agg → two strata windows → 10-row
  * broadcast join. One fact scan; nothing downstream grows with the
  * corpus.
  */
object Lorenz {

  private val q = Q(
    "a96_lorenz_deciles",
    (s, d) => {
      val strata = Tables(s, d).orders
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(DecimalType(30, 2))).as("rev"))
        .groupBy(col("rev")).agg(count(lit(1)).as("n_c"))
      val w = Window.orderBy("rev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = strata
        .withColumn("cumn", sum(col("n_c")).over(w))
        .withColumn("cumrev", sum(col("rev") * col("n_c")).over(w))
        .localCheckpoint(false)
      val tot = cum.agg(max(col("cumn")).as("n"),
        max(col("cumrev")).cast("double").as("t"))
      val deciles = s.range(1, 11).select(col("id").as("decile"))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n"), col("t"),
          expr("(decile * n) div 10").as("b"))
      deciles.join(cum,
          col("cumn") >= col("b") && (col("cumn") - col("n_c")) < col("b"))
        .select(col("decile"), col("b").as("boundary_rank"),
          round((col("cumrev").cast("double") -
            col("rev").cast("double") *
              (col("cumn") - col("b")).cast("double")) / col("t"), 6)
            .as("cum_share"))
    },
    Some(
      """WITH per_cust AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(30,2))) AS rev
        |  FROM orders GROUP BY 1),
        |strata AS (SELECT rev, count(*) AS n_c FROM per_cust GROUP BY 1),
        |cum AS (
        |  SELECT rev, n_c,
        |    CAST(sum(n_c) OVER (ORDER BY rev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cumn,
        |    sum(rev * n_c) OVER (ORDER BY rev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumrev
        |  FROM strata),
        |tot AS (SELECT max(cumn) AS n, CAST(max(cumrev) AS DOUBLE) AS t
        |        FROM cum),
        |deciles AS (
        |  SELECT d.decile, tot.n, tot.t, (d.decile * tot.n) // 10 AS b
        |  FROM (SELECT unnest(range(1, 11)) AS decile) d CROSS JOIN tot)
        |SELECT decile, b AS boundary_rank,
        |  round((CAST(cumrev AS DOUBLE)
        |    - CAST(rev AS DOUBLE) * CAST(cumn - b AS DOUBLE)) / t, 6)
        |    AS cum_share
        |FROM deciles JOIN cum ON cumn >= b AND (cumn - n_c) < b""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
