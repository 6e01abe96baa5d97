package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Mann–Kendall trend test — the nonparametric "is this series
  * actually trending" significance companion to a35's Theil–Sen
  * slope (which estimates; MK tests): S = Σ_{i<j} sign(y_j − y_i)
  * over the daily order-count series, variance with the tie
  * correction Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18, and the
  * continuity-corrected z.
  *
  * Exactness: the series collapses to the |days| spine first, S and
  * the tie masses are pure BIGINT over the spine×spine pair join
  * (days², never rows²), and Var's /18 happens once in IEEE after
  * the exact integer numerator. Scale: one fact aggregate; the pair
  * join is calendar-bounded (a decade ≈ 3.7k days → 13M cell pairs,
  * constant in corpus size).
  */
object MannKendall {

  private val q = Q(
    "a69_mann_kendall",
    (s, d) => {
      val daily = Tables(s, d).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("y"))
        .localCheckpoint(false)
      val sAgg = daily.alias("a")
        .join(broadcast(daily.alias("b")), col("b.day") > col("a.day"))
        .agg(sum(signum((col("b.y") - col("a.y")).cast("double"))
          .cast("long")).as("s"))
      val n = daily.agg(count(lit(1)).as("n"))
      val ties = daily.groupBy("y").agg(count(lit(1)).as("t"))
        .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_mass"))
      sAgg.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
        .select(col("n"), col("s"), col("tie_mass"),
          expr("n * (n - 1) * (2 * n + 5) - tie_mass").as("var18"))
        .select(col("n"), col("s"), col("tie_mass"),
          round(
            when(col("s") > 0, (col("s") - 1).cast("double"))
              .when(col("s") < 0, (col("s") + 1).cast("double"))
              .otherwise(0.0) /
              sqrt(col("var18").cast("double") / 18.0), 6).as("z"))
    },
    Some(
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
        |    WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM daily a JOIN daily b ON b.day > a.day),
        |n AS (SELECT count(*) AS n FROM daily),
        |ties AS (
        |  SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
        |    AS tie_mass
        |  FROM (SELECT count(*) AS t FROM daily GROUP BY y)),
        |parts AS (
        |  SELECT n.n, s.s, ties.tie_mass,
        |    n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_mass AS var18
        |  FROM s CROSS JOIN n CROSS JOIN ties)
        |SELECT n, s, tie_mass,
        |  round(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
        |    WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) ELSE 0.0 END
        |    / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6) AS z
        |FROM parts""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
