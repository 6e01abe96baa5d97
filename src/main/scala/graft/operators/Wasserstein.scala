package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 1-D Wasserstein-1 (earth-mover) distance between two groups — the
  * distribution-drift metric ML monitoring prefers over KS when the
  * SIZE of the gap matters, not just its maximum (a49's KS statistic
  * is sup|ΔCDF|; W₁ is ∫|ΔCDF|). In one dimension the transport plan
  * is the CDF gap itself, so the metric is EXACT relational algebra:
  *
  *   W₁ = Σ_v |F₁(v) − F₂(v)| · (next(v) − v)
  *      = Σ_v |cum₁·n₂ − cum₂·n₁| · gap / (n₁·n₂)
  *
  * over the sorted union of distinct values (cents, so gaps are exact
  * integers). The numerator Σ|…|·gap is pure BIGINT (bounded by
  * n₁·n₂·range ≈ 1e8·1e7 at sf1 — within int64 headroom ~1e18 with
  * n ≈ 1e7 per side and 1e7 cent range... at larger SFs the ppm scale
  * drops a digit, same documented bound as the gini row); ONE IEEE
  * divide at the end. Count-table discipline: per-side cumulative
  * counts over distinct values, LEAD for the gap — memory bounds by
  * distinct values, the fact table is touched once.
  */
object Wasserstein {

  private val q = Q(
    "a66_wasserstein_1d",
    (s, d) => {
      val t = Tables(s, d)
      val rows = t.orders
        .join(t.customer.select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(round(col("o_totalprice") * 100).cast("long").as("v"),
          (col("c_mktsegment") === "BUILDING").cast("long").as("g"))
      val cells = rows.groupBy("v").agg(
        sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c2"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = cells.select(col("v"),
        sum(col("c1")).over(w).as("cum1"),
        sum(col("c2")).over(w).as("cum2"),
        lead(col("v"), 1).over(Window.orderBy("v")).as("vn"))
      val n = rows.agg(sum(col("g")).as("n1"),
        sum(lit(1L) - col("g")).as("n2"))
      cum.filter(col("vn").isNotNull)
        .crossJoin(broadcast(n))
        .select(
          (abs(col("cum1") * col("n2") - col("cum2") * col("n1")) *
            (col("vn") - col("v"))).as("piece"),
          col("n1"), col("n2"))
        .groupBy("n1", "n2")
        .agg(sum(col("piece").cast("decimal(38,0)")).as("w_num"))
        .select(col("n1"), col("n2"),
          round(col("w_num").cast("double") /
            (col("n1") * col("n2")).cast("double"), 6)
            .as("w1_cents"))
    },
    Some(
      """WITH rows_ AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cells AS (
        |  SELECT v, CAST(sum(g) AS BIGINT) AS c1,
        |    CAST(sum(1 - g) AS BIGINT) AS c2
        |  FROM rows_ GROUP BY 1),
        |cum AS (
        |  SELECT v,
        |    CAST(sum(c1) OVER w AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER w AS BIGINT) AS cum2,
        |    lead(v) OVER (ORDER BY v) AS vn
        |  FROM cells
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |n AS (
        |  SELECT CAST(sum(g) AS BIGINT) AS n1,
        |    CAST(sum(1 - g) AS BIGINT) AS n2
        |  FROM rows_)
        |SELECT n1, n2,
        |  round(CAST(sum(CAST(abs(cum1 * n2 - cum2 * n1) * (vn - v)
        |      AS DECIMAL(38,0))) AS DOUBLE)
        |    / CAST(n1 * n2 AS DOUBLE), 6) AS w1_cents
        |FROM cum CROSS JOIN n
        |WHERE vn IS NOT NULL
        |GROUP BY n1, n2""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
