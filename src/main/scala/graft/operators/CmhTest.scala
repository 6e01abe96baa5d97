package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._

/** Cochran–Mantel–Haenszel test + Mantel–Haenszel common odds ratio —
  * the stratified 2×2 association test (does exposure move the outcome
  * once a confounder is held fixed?), the missing sibling of the a42
  * chi-square (which POOLS strata and so falls to Simpson's paradox).
  * Exposure: BUILDING-segment customers; outcome: order finalised
  * ('F'); strata: order year (the confounder — status and segment mix
  * both drift over time).
  *
  *   CMH = (Σ_k (a_k − E_k))² / Σ_k V_k,  E = r1·c1/n,
  *   V = r1·r0·c1·c0 / (n²(n−1)),  OR_MH = Σ(a·d/n) / Σ(b·c/n)
  *
  * Determinism: per-stratum cells are exact BIGINTs; each stratum term
  * is a FIXED order of IEEE ops from those integers (products as
  * BIGINT, then one division per factor), and the cross-stratum sums
  * go through [[Stable]] decimal casts — so the statistic is
  * bit-identical in both engines and run-to-run at any partitioning.
  * V avoids the r1·r0·c1·c0 BIGINT overflow (≈n⁴) by dividing per
  * factor; n⁴ would overflow at ~sf1, doubles don't.
  *
  * Scale: one fact⋈dim join + a |strata|-row conditional-count agg +
  * one global decimal agg. Nothing beyond the join touches row count.
  */
object CmhTest {

  private val q = Q(
    "a62_cmh_test",
    (s, d) => {
      val t = Tables(s, d)
      val rows = t.orders
        .join(t.customer.select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(year(col("o_orderdate")).as("stratum"),
          (col("c_mktsegment") === "BUILDING").cast("long").as("x"),
          (col("o_orderstatus") === "F").cast("long").as("y"))
      val cells = rows.groupBy("stratum").agg(
        sum(col("x") * col("y")).as("a"),
        sum(col("x") * (lit(1L) - col("y"))).as("b"),
        sum((lit(1L) - col("x")) * col("y")).as("c"),
        sum((lit(1L) - col("x")) * (lit(1L) - col("y"))).as("d"))
      val n = col("a") + col("b") + col("c") + col("d")
      val terms = cells.select(
        (col("a").cast("double") -
          ((col("a") + col("b")) * (col("a") + col("c"))).cast("double")
            / n.cast("double")).as("dev"),
        (((col("a") + col("b")) * (col("a") + col("c"))).cast("double") /
          n.cast("double") *
          ((col("c") + col("d")).cast("double") / n.cast("double")) *
          ((col("b") + col("d")).cast("double") /
            (n - 1).cast("double"))).as("v"),
        ((col("a") * col("d")).cast("double") / n.cast("double"))
          .as("ad_n"),
        ((col("b") * col("c")).cast("double") / n.cast("double"))
          .as("bc_n"))
      terms.agg(count(lit(1)).as("n_strata"),
          Stable.dsum(col("dev"), 9).as("sum_dev"),
          Stable.dsum(col("v"), 9).as("sum_var"),
          Stable.dsum(col("ad_n"), 9).as("sum_ad"),
          Stable.dsum(col("bc_n"), 9).as("sum_bc"))
        .select(col("n_strata"), col("sum_dev"), col("sum_var"),
          round(col("sum_dev") * col("sum_dev") / col("sum_var"), 6)
            .as("cmh"),
          round(col("sum_ad") / col("sum_bc"), 6).as("or_mh"))
    },
    Some(
      s"""WITH rows_ AS (
         |  SELECT EXTRACT(year FROM o_orderdate) AS stratum,
         |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS x,
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |cells AS (
         |  SELECT stratum,
         |    CAST(sum(x * y) AS BIGINT) AS a,
         |    CAST(sum(x * (1 - y)) AS BIGINT) AS b,
         |    CAST(sum((1 - x) * y) AS BIGINT) AS c,
         |    CAST(sum((1 - x) * (1 - y)) AS BIGINT) AS d
         |  FROM rows_ GROUP BY 1),
         |terms AS (
         |  SELECT
         |    CAST(a AS DOUBLE) - CAST((a + b) * (a + c) AS DOUBLE)
         |      / CAST(a + b + c + d AS DOUBLE) AS dev,
         |    CAST((a + b) * (a + c) AS DOUBLE)
         |        / CAST(a + b + c + d AS DOUBLE)
         |      * (CAST(c + d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE))
         |      * (CAST(b + d AS DOUBLE)
         |          / CAST(a + b + c + d - 1 AS DOUBLE)) AS v,
         |    CAST(a * d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE)
         |      AS ad_n,
         |    CAST(b * c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE)
         |      AS bc_n
         |  FROM cells)
         |SELECT count(*) AS n_strata,
         |  ${Stable.dsumSql("dev", 9)} AS sum_dev,
         |  ${Stable.dsumSql("v", 9)} AS sum_var,
         |  round(${Stable.dsumSql("dev", 9)} * ${Stable.dsumSql("dev", 9)}
         |    / ${Stable.dsumSql("v", 9)}, 6) AS cmh,
         |  round(${Stable.dsumSql("ad_n", 9)}
         |    / ${Stable.dsumSql("bc_n", 9)}, 6) AS or_mh
         |FROM terms""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
