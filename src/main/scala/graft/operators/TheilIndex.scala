package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._

/** Theil inequality indices — the decomposable entropy-based
  * companions to t_source_gini's rank-based Gini over the customer
  * revenue distribution:
  *
  *   Theil-T = (1/N) Σ (x/μ)·ln(x/μ)     (top-sensitive)
  *   Theil-L = (1/N) Σ ln(μ/x)           (bottom-sensitive, MLD)
  *
  * Per-row ln rides the IEEE-libm parity the G²/PSI rows
  * established; each row's term is a deterministic double, summed
  * through the decimal-stable cast so partial-aggregation order
  * can't move the total. μ itself comes from an exact decimal sum.
  *
  * Shape: one revenue aggregate per customer (map-side combinable),
  * one 1-row moment broadcast back into the per-customer scan, one
  * term aggregate — two passes over the |customers| spine, nothing
  * pairwise. (Gini needs a rank; Theil deliberately doesn't — at
  * 100 TB this is the inequality number that costs no sort.)
  */
object TheilIndex {

  private val q = Q(
    "a81_theil_index",
    (s, d) => {
      val rev = Tables(s, d).orders
        .groupBy(col("o_custkey"))
        .agg(Stable.dsum(col("o_totalprice"), 2).as("x"))
      val mu = rev.agg(count(lit(1)).as("n"),
        Stable.dsum(col("x"), 2).as("sx"))
        .select(col("n"), (col("sx") / col("n").cast("double")).as("mu"))
      rev.crossJoin(broadcast(mu))
        .agg(max(col("n")).as("n"), max(col("mu")).as("mu"),
          Stable.dsum((col("x") / col("mu")) * log(col("x") / col("mu")),
            12).as("tsum"),
          Stable.dsum(log(col("mu") / col("x")), 12).as("lsum"))
        .select(col("n"), round(col("mu"), 6).as("mu"),
          round(col("tsum") / col("n").cast("double"), 6).as("theil_t"),
          round(col("lsum") / col("n").cast("double"), 6).as("theil_l"))
    },
    Some(
      s"""WITH rev AS (
         |  SELECT o_custkey, ${Stable.dsumSql("o_totalprice", 2)} AS x
         |  FROM orders GROUP BY 1),
         |mu AS (
         |  SELECT count(*) AS n,
         |    ${Stable.dsumSql("x", 2)} / count(*) AS mu
         |  FROM rev),
         |t AS (
         |  SELECT max(n) AS n, max(mu) AS mu,
         |    ${Stable.dsumSql("(x / mu) * ln(x / mu)", 12)} AS tsum,
         |    ${Stable.dsumSql("ln(mu / x)", 12)} AS lsum
         |  FROM rev CROSS JOIN mu)
         |SELECT n, round(mu, 6) AS mu,
         |  round(tsum / CAST(n AS DOUBLE), 6) AS theil_t,
         |  round(lsum / CAST(n AS DOUBLE), 6) AS theil_l
         |FROM t""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
