package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Qini / uplift curve (Radcliffe 2007) — the experiment-analytics
  * complement to the ATE rows (`a64_stratified_ate`, `a51_cuped`,
  * `e_quantile_treatment_effect`): rank the population by a targeting
  * score, then per score decile report the cumulative incremental
  * conversions the treated arm shows over the control arm, scaled to
  * the treated count
  *
  *   qini(k) = R_t(k) − R_c(k) · N_t(k) / N_c(k)
  *
  * The curve against the x-axis of cumulative population is what a
  * targeting model is judged by (area under it = the Qini coefficient).
  *
  * Determinism: deciles come from a rank over (score DESC, user id) —
  * an explicit total order, not ntile on an ambiguous sort — and the
  * decile boundary is rank·10 ≤ N·(d+1) in integer form. The per-decile
  * sums are integral counts, so the only division is the final scaled
  * subtraction, rounded to 6 dp. Shape: one user-level aggregate, one
  * rank window over the user frame (not the events), one 10-row rollup.
  */
object Uplift {

  val Deciles = 10

  private val q = Q(
    "a102_qini_uplift",
    (s, d) => {
      // user frame: arm from the id (the synthetic assignment the other
      // experiment rows share), score = mean event value (the targeting
      // model stand-in), outcome = made a purchase
      val users = Tables(s, d).events
        .groupBy(col("user_id"))
        .agg(
          graft.util.Stable.davg(col("value")).as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
        .select(col("user_id"), (col("user_id") % 2 === 0).as("treated"),
          round(col("score"), 6).as("score"), col("converted"))
      val n = users.agg(count(lit(1)).as("n_users"))
      val w = Window.orderBy(desc("score"), asc("user_id"))
      val ranked = users.withColumn("rk", row_number().over(w))
        .crossJoin(broadcast(n))
        // decile d = smallest d with rk*10 <= n*(d+1): integer form
        .withColumn("decile",
          ceil(col("rk") * Deciles / col("n_users")).cast("int") - 1)
      val byDecile = ranked.groupBy("decile")
        .agg(
          sum(when(col("treated"), 1L).otherwise(0L)).as("n_t"),
          sum(when(!col("treated"), 1L).otherwise(0L)).as("n_c"),
          sum(when(col("treated"), col("converted")).otherwise(0L))
            .as("r_t"),
          sum(when(!col("treated"), col("converted")).otherwise(0L))
            .as("r_c"))
      val wc = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDecile
        .withColumn("cn_t", sum(col("n_t")).over(wc))
        .withColumn("cn_c", sum(col("n_c")).over(wc))
        .withColumn("cr_t", sum(col("r_t")).over(wc))
        .withColumn("cr_c", sum(col("r_c")).over(wc))
        .select(col("decile"), col("cn_t"), col("cn_c"), col("cr_t"),
          col("cr_c"),
          round(col("cr_t").cast("double") -
            col("cr_c").cast("double") * col("cn_t").cast("double") /
              col("cn_c").cast("double"), 6).as("qini"))
    },
    Some(
      s"""WITH users AS (
         |  SELECT user_id, user_id % 2 = 0 AS treated,
         |    round(${graft.util.Stable.davgSql("value")}, 6) AS score,
         |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS converted
         |  FROM events GROUP BY user_id),
         |ranked AS (
         |  SELECT *,
         |    row_number() OVER (ORDER BY score DESC, user_id) AS rk,
         |    (SELECT count(*) FROM users) AS n_users
         |  FROM users),
         |dec AS (
         |  SELECT CAST(ceil(rk * $Deciles / CAST(n_users AS DOUBLE))
         |           AS INT) - 1 AS decile,
         |    treated, converted
         |  FROM ranked),
         |byd AS (
         |  SELECT decile,
         |    CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         |    CAST(sum(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         |    CAST(sum(CASE WHEN treated THEN converted ELSE 0 END) AS BIGINT) AS r_t,
         |    CAST(sum(CASE WHEN NOT treated THEN converted ELSE 0 END) AS BIGINT) AS r_c
         |  FROM dec GROUP BY decile)
         |SELECT decile,
         |  CAST(sum(n_t) OVER w AS BIGINT) AS cn_t,
         |  CAST(sum(n_c) OVER w AS BIGINT) AS cn_c,
         |  CAST(sum(r_t) OVER w AS BIGINT) AS cr_t,
         |  CAST(sum(r_c) OVER w AS BIGINT) AS cr_c,
         |  round(CAST(sum(r_t) OVER w AS DOUBLE) -
         |    CAST(sum(r_c) OVER w AS DOUBLE) *
         |      CAST(sum(n_t) OVER w AS DOUBLE) /
         |      CAST(sum(n_c) OVER w AS DOUBLE), 6) AS qini
         |FROM byd
         |WINDOW w AS (ORDER BY decile
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
