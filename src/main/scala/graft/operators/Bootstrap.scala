package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals — the single-pass, shardable
  * bootstrap (Chamandy et al., "Estimating Uncertainty for Massive Data
  * Streams", Google 2012): instead of resampling n rows with replacement
  * B times (impossible without global coordination at fleet scale), each
  * row contributes an independent Poisson(1)-distributed WEIGHT to each
  * of B replicates. Weights come from a deterministic md5-prefix hash of
  * (row key, replicate id) pushed through the Poisson(1) inverse CDF —
  * the same engine-neutral discipline as `t_train_test_split`, so runs,
  * retries, partitionings and independent engines all draw identical
  * replicates (no RNG state anywhere).
  *
  * Reference anchor: the reference publishes point-estimate indicator
  * tables only (`ojd_daps/flows/aggregate/`); a production feed needs
  * uncertainty on those weekly means, and the naive bootstrap is the
  * part that cannot ship at 100 TB.
  *
  * Scale shape: the ×B explode feeds DIRECTLY into a partial aggregate
  * on (group, replicate), so the B-fold blow-up is consumed map-side —
  * the shuffle carries groups×B partial rows per task, never rows×B.
  * Replicate means are exact BIGINT milli-unit divisions; the CI is an
  * order statistic (ranks 3 and 98 of 100), not a float quantile.
  * BIGINT products bound: Σ(w·cents) ≤ 7·n·maxCents — at trillions of
  * rows swap the sum to DECIMAL(38,0); same plan.
  */
object Bootstrap {

  val Replicates = 100

  /** Poisson(1) inverse CDF over a uniform integer in [0, 1e6): CDF
    * thresholds are round(1e6·P(X≤k)) for k = 0..6, tail mass → 7.
    */
  def poissonWeight(h: Column): Column =
    when(h < 367879, 0L).when(h < 735759, 1L).when(h < 919699, 2L)
      .when(h < 981012, 3L).when(h < 996340, 4L).when(h < 999406, 5L)
      .when(h < 999917, 6L).otherwise(7L)

  /** Per-group mean with a 95% Poisson-bootstrap CI, all in exact
    * milli-unit integers.
    */
  def meanCi(orders: DataFrame): DataFrame = {
    val base = orders.select(
      col("o_orderkey").as("k"), col("o_orderpriority").as("grp"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val reps = base.withColumn("b",
      explode(sequence(lit(0), lit(Replicates - 1))))
    val h = pmod(
      conv(substring(md5(concat_ws(":", col("k"), col("b"))), 1, 6), 16, 10)
        .cast("long"),
      lit(1000000L))
    val repMeans = reps.withColumn("w", poissonWeight(h))
      .groupBy("grp", "b")
      .agg(expr("(10 * sum(w * cents)) div sum(w)").as("mean_milli"))
    val ranked = repMeans.withColumn("rn",
      row_number().over(Window.partitionBy("grp")
        .orderBy(col("mean_milli"), col("b"))))
    val bounds = ranked.groupBy("grp").agg(
      max(when(col("rn") === 3, col("mean_milli"))).as("lo_milli"),
      max(when(col("rn") === 98, col("mean_milli"))).as("hi_milli"))
    val point = base.groupBy("grp").agg(
      count(lit(1)).as("n_orders"),
      expr("(10 * sum(cents)) div count(*)").as("point_milli"))
    point.join(bounds, "grp")
      .select(col("grp").as("o_orderpriority"), col("n_orders"),
        col("point_milli"), col("lo_milli"), col("hi_milli"))
  }

  private val q = Q(
    "a36_poisson_bootstrap_ci",
    (s, d) => meanCi(Tables(s, d).orders),
    Some(
      s"""WITH base AS (
         |  SELECT o_orderkey AS k, o_orderpriority AS grp,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |reps AS (SELECT unnest(range(0, $Replicates)) AS b),
         |wtd AS (
         |  SELECT grp, b, cents,
         |    CASE
         |      WHEN h < 367879 THEN 0 WHEN h < 735759 THEN 1
         |      WHEN h < 919699 THEN 2 WHEN h < 981012 THEN 3
         |      WHEN h < 996340 THEN 4 WHEN h < 999406 THEN 5
         |      WHEN h < 999917 THEN 6 ELSE 7 END AS w
         |  FROM (
         |    SELECT grp, b, cents,
         |      CAST(concat('0x',
         |        substr(md5(k || ':' || b), 1, 6)) AS BIGINT) % 1000000 AS h
         |    FROM base CROSS JOIN reps)),
         |repmeans AS (
         |  SELECT grp, b,
         |    CAST((10 * sum(w * cents)) // sum(w) AS BIGINT) AS mean_milli
         |  FROM wtd GROUP BY 1, 2),
         |ranked AS (
         |  SELECT grp, mean_milli,
         |    row_number() OVER (PARTITION BY grp
         |      ORDER BY mean_milli, b) AS rn
         |  FROM repmeans),
         |bounds AS (
         |  SELECT grp,
         |    max(CASE WHEN rn = 3 THEN mean_milli END) AS lo_milli,
         |    max(CASE WHEN rn = 98 THEN mean_milli END) AS hi_milli
         |  FROM ranked GROUP BY 1),
         |pt AS (
         |  SELECT grp, count(*) AS n_orders,
         |    CAST((10 * sum(cents)) // count(*) AS BIGINT) AS point_milli
         |  FROM base GROUP BY 1)
         |SELECT pt.grp AS o_orderpriority, n_orders, point_milli,
         |  lo_milli, hi_milli
         |FROM pt JOIN bounds ON pt.grp = bounds.grp""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
