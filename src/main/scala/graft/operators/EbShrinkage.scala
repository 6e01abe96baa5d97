package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Empirical-Bayes gamma–Poisson shrinkage of per-customer order
  * counts — the "batting average" estimator: a customer seen 3 times
  * should NOT be ranked by the raw rate 3; shrink every count toward
  * the population with a gamma prior fitted by method of moments,
  *
  *   v > m:  β̂ = m/(v−m),  α̂ = m·β̂,
  *   posterior mean = (x + α̂)/(1 + β̂)
  *
  * (m, v the mean/variance of the counts; overdispersion v > m is
  * certified by a91 first). The moments are exact BIGINT sums; each
  * posterior is one IEEE chain from them, computed map-side after a
  * 1-row broadcast — the canonical shrinkage shape for scoring every
  * entity in one pass.
  *
  * Output is the 20 lowest custkeys (deterministic slice) so the
  * result stays constant-size while the computation covers the full
  * population.
  */
object EbShrinkage {

  private val q = Q(
    "a92_eb_shrinkage",
    (s, d) => {
      val counts = Tables(s, d).orders
        .groupBy("o_custkey").agg(count(lit(1)).as("x"))
        .localCheckpoint(false)
      val prior = counts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
        .withColumn("m", expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"))
        .withColumn("v", expr(
          "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)"))
        .withColumn("beta", expr("m / (v - m)"))
        .withColumn("alpha", expr("m * (m / (v - m))"))
        .select("alpha", "beta")
      counts.filter(col("o_custkey") <= 20)
        .crossJoin(broadcast(prior))
        .select(col("o_custkey"), col("x"),
          round(col("alpha"), 6).as("alpha"),
          round(col("beta"), 6).as("beta"),
          round((col("x").cast("double") + col("alpha")) /
            (lit(1.0) + col("beta")), 6).as("posterior_mean"))
    },
    Some(
      """WITH counts AS (
        |  SELECT o_custkey, count(*) AS x FROM orders GROUP BY 1),
        |red AS (
        |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM counts),
        |mo AS (
        |  SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m,
        |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v
        |  FROM red),
        |prior AS (
        |  SELECT m * (m / (v - m)) AS alpha, m / (v - m) AS beta FROM mo)
        |SELECT o_custkey, x,
        |  round(alpha, 6) AS alpha, round(beta, 6) AS beta,
        |  round((CAST(x AS DOUBLE) + alpha) / (1.0 + beta), 6)
        |    AS posterior_mean
        |FROM counts CROSS JOIN prior
        |WHERE o_custkey <= 20""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
