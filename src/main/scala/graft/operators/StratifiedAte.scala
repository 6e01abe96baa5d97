package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._

/** Post-stratified average treatment effect — the design-based causal
  * estimate (stratify on the confounder, difference means within each
  * stratum, reweight by stratum size) that pairs with a51's CUPED
  * (variance reduction) and a62's CMH (binary outcomes): here the
  * outcome is continuous (order value in exact cents), treatment is
  * the BUILDING segment, strata are order years.
  *
  *   ATE = Σ_k (n_k/N)·(ȳ₁ₖ − ȳ₀ₖ),
  *   Var = Σ_k (n_k/N)²·(s²₁ₖ/n₁ₖ + s²₀ₖ/n₀ₖ)
  *
  * Exactness: per-cell moments are decimal(38,0) sums of exact cent
  * integers (cents² would overflow BIGINT at ~sf0.1 — same guard as
  * a29's normal equations), per-stratum terms are a fixed order of
  * IEEE ops from those exact sums, and the cross-stratum reductions
  * go through [[Stable]] decimal casts. Scale: one fact⋈dim join, one
  * |strata×2|-cell aggregate, one |strata|-row reduction.
  */
object StratifiedAte {

  private val q = Q(
    "a64_stratified_ate",
    (s, d) => {
      val t = Tables(s, d)
      val rows = t.orders
        .join(t.customer.select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(year(col("o_orderdate")).as("stratum"),
          (col("c_mktsegment") === "BUILDING").cast("long").as("z"),
          round(col("o_totalprice") * 100).cast("long").as("y_c"))
      val cells = rows.groupBy("stratum", "z").agg(
        count(lit(1)).as("n"),
        sum(col("y_c").cast("decimal(38,0)")).as("sy"),
        sum((col("y_c") * col("y_c")).cast("decimal(38,0)")).as("syy"))
      val strata = cells.groupBy("stratum").agg(
        sum(col("n")).as("n_k"),
        max(when(col("z") === 1, col("n"))).as("n1"),
        max(when(col("z") === 1, col("sy"))).as("sy1"),
        max(when(col("z") === 1, col("syy"))).as("syy1"),
        max(when(col("z") === 0, col("n"))).as("n0"),
        max(when(col("z") === 0, col("sy"))).as("sy0"),
        max(when(col("z") === 0, col("syy"))).as("syy0"))
      val terms = strata.select(col("n_k"),
        (col("sy1").cast("double") / col("n1").cast("double") -
          col("sy0").cast("double") / col("n0").cast("double"))
          .as("diff"),
        (((col("syy1").cast("double") -
            col("sy1").cast("double") * col("sy1").cast("double") /
              col("n1").cast("double")) /
            (col("n1") - 1).cast("double")) / col("n1").cast("double") +
          ((col("syy0").cast("double") -
            col("sy0").cast("double") * col("sy0").cast("double") /
              col("n0").cast("double")) /
            (col("n0") - 1).cast("double")) / col("n0").cast("double"))
          .as("vterm"))
      val n = terms.agg(sum(col("n_k")).as("n_total"))
      terms.crossJoin(broadcast(n))
        .select(col("n_k"), col("n_total"),
          (col("n_k").cast("double") / col("n_total").cast("double") *
            col("diff")).as("wdiff"),
          ((col("n_k").cast("double") / col("n_total").cast("double")) *
            (col("n_k").cast("double") / col("n_total").cast("double")) *
            col("vterm")).as("wv"))
        .agg(count(lit(1)).as("n_strata"), max(col("n_total")).as("n"),
          Stable.dsum(col("wdiff"), 9).as("ate_cents_raw"),
          Stable.dsum(col("wv"), 9).as("var_cents"))
        .select(col("n_strata"), col("n"),
          round(col("ate_cents_raw"), 4).as("ate_cents"),
          round(sqrt(col("var_cents")), 6).as("se_cents"))
    },
    Some(
      s"""WITH rows_ AS (
         |  SELECT EXTRACT(year FROM o_orderdate) AS stratum,
         |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS z,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS y_c
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |cells AS (
         |  SELECT stratum, z, count(*) AS n,
         |    sum(CAST(y_c AS DECIMAL(38,0))) AS sy,
         |    sum(CAST(y_c * y_c AS DECIMAL(38,0))) AS syy
         |  FROM rows_ GROUP BY 1, 2),
         |strata AS (
         |  SELECT stratum, CAST(sum(n) AS BIGINT) AS n_k,
         |    max(CASE WHEN z = 1 THEN n END) AS n1,
         |    max(CASE WHEN z = 1 THEN sy END) AS sy1,
         |    max(CASE WHEN z = 1 THEN syy END) AS syy1,
         |    max(CASE WHEN z = 0 THEN n END) AS n0,
         |    max(CASE WHEN z = 0 THEN sy END) AS sy0,
         |    max(CASE WHEN z = 0 THEN syy END) AS syy0
         |  FROM cells GROUP BY 1),
         |terms AS (
         |  SELECT n_k,
         |    CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
         |      - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff,
         |    ((CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE)
         |        * CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE))
         |      / CAST(n1 - 1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
         |    + ((CAST(syy0 AS DOUBLE) - CAST(sy0 AS DOUBLE)
         |        * CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))
         |      / CAST(n0 - 1 AS DOUBLE)) / CAST(n0 AS DOUBLE) AS vterm
         |  FROM strata),
         |n AS (SELECT CAST(sum(n_k) AS BIGINT) AS n_total FROM terms),
         |w AS (
         |  SELECT n_k, n_total,
         |    CAST(n_k AS DOUBLE) / CAST(n_total AS DOUBLE) * diff
         |      AS wdiff,
         |    (CAST(n_k AS DOUBLE) / CAST(n_total AS DOUBLE))
         |      * (CAST(n_k AS DOUBLE) / CAST(n_total AS DOUBLE)) * vterm
         |      AS wv
         |  FROM terms CROSS JOIN n)
         |SELECT count(*) AS n_strata, max(n_total) AS n,
         |  round(${Stable.dsumSql("wdiff", 9)}, 4) AS ate_cents,
         |  round(sqrt(${Stable.dsumSql("wv", 9)}), 6) AS se_cents
         |FROM w""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
