package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._

/** Price elasticity of demand — the log-log OLS the pricing side of
  * an analytics stack runs: regress ln(quantity) on ln(unit price)
  * across line items; the slope IS the elasticity (% quantity change
  * per % price change). Same normal-equations discipline as a29:
  * the five sufficient statistics Σu, Σv, Σuv, Σu², n (u = ln price,
  * v = ln qty) fold through decimal-stable sums (scale 9 — ln terms
  * are O(10), the a77/a81 precedent), the slope/intercept/R² chain
  * is fixed IEEE on the 1-row frame.
  *
  * Shape: ONE map-side-combinable aggregate over the fact scan to a
  * 1-row frame. One scan at any scale.
  */
object Elasticity {

  private val q = Q(
    "e_price_elasticity",
    (s, d) => {
      val li = Tables(s, d).lineitem
        .select(log(col("l_extendedprice") / col("l_quantity")).as("u"),
          log(col("l_quantity")).as("v"))
      li.agg(count(lit(1)).as("n"),
        Stable.dsum(col("u"), 9).as("su"),
        Stable.dsum(col("v"), 9).as("sv"),
        Stable.dsum(col("u") * col("v"), 9).as("suv"),
        Stable.dsum(col("u") * col("u"), 9).as("suu"),
        Stable.dsum(col("v") * col("v"), 9).as("svv"))
        .selectExpr("n",
          "round((CAST(n AS DOUBLE) * suv - su * sv) / (CAST(n AS DOUBLE) * suu - su * su), 6) AS elasticity",
          "round((sv - (CAST(n AS DOUBLE) * suv - su * sv) / (CAST(n AS DOUBLE) * suu - su * su) * su) / CAST(n AS DOUBLE), 6) AS intercept",
          "round(((CAST(n AS DOUBLE) * suv - su * sv) * (CAST(n AS DOUBLE) * suv - su * sv)) " +
            "/ ((CAST(n AS DOUBLE) * suu - su * su) * (CAST(n AS DOUBLE) * svv - sv * sv)), 6) AS r2")
    },
    Some(
      s"""WITH t AS (
         |  SELECT ln(l_extendedprice / l_quantity) AS u,
         |    ln(l_quantity) AS v
         |  FROM lineitem),
         |red AS (
         |  SELECT count(*) AS n,
         |    ${Stable.dsumSql("u", 9)} AS su,
         |    ${Stable.dsumSql("v", 9)} AS sv,
         |    ${Stable.dsumSql("u * v", 9)} AS suv,
         |    ${Stable.dsumSql("u * u", 9)} AS suu,
         |    ${Stable.dsumSql("v * v", 9)} AS svv
         |  FROM t)
         |SELECT n,
         |  round((CAST(n AS DOUBLE) * suv - su * sv) / (CAST(n AS DOUBLE) * suu - su * su), 6) AS elasticity,
         |  round((sv - (CAST(n AS DOUBLE) * suv - su * sv) / (CAST(n AS DOUBLE) * suu - su * su) * su) / CAST(n AS DOUBLE), 6) AS intercept,
         |  round(((CAST(n AS DOUBLE) * suv - su * sv) * (CAST(n AS DOUBLE) * suv - su * sv))
         |    / ((CAST(n AS DOUBLE) * suu - su * su) * (CAST(n AS DOUBLE) * svv - sv * sv)), 6) AS r2
         |FROM red""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
