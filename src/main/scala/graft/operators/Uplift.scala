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
  * Determinism AND scale: deciles come from score THRESHOLDS (the
  * exact 10..90% quantiles of the score, computed by the `percentile`
  * aggregate and broadcast), not from a global rank window — a
  * row_number over all users is a single-partition sort at fleet
  * scale, while the quantile aggregate combines map-side and the
  * assignment is a broadcast comparison. Ties AT a threshold all land
  * in the higher decile (>= comparison), so decile sizes may be
  * uneven under heavy ties — reported in the output, and replayed
  * identically by the oracle (scores round to 6 dp first, and Spark's
  * `percentile` matches DuckDB's `quantile_cont` — the a4 parity).
  * The per-decile sums are integral counts, so the only division is
  * the final scaled subtraction, rounded to 6 dp. Shape: one
  * user-level aggregate, one quantile aggregate, one broadcast
  * comparison, one 10-row rollup.
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
      // decile thresholds: exact score quantiles at 0.9 .. 0.1 —
      // decile 0 is the TOP tenth, so the boundary for decile d is the
      // (1 - (d+1)/10) quantile; a score >= t(d) joins decile <= d
      val thresholds = users.agg(
        percentile(col("score"),
          array((1 until Deciles).map(d =>
            lit(1.0 - d.toDouble / Deciles)): _*)).as("ts"))
      val assigned = users.crossJoin(broadcast(thresholds))
        // decile = number of thresholds strictly above the score
        .withColumn("decile",
          size(filter(col("ts"), t => t > col("score"))).cast("int"))
      val byDecile = assigned.groupBy("decile")
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
         |ts AS (
         |  SELECT ${(1 until 10).map(d =>
             s"quantile_cont(score, ${1.0 - d / 10.0}) AS t$d")
             .mkString(", ")}
         |  FROM users),
         |dec AS (
         |  SELECT CAST(${(1 until 10).map(d =>
             s"(CASE WHEN ts.t$d > score THEN 1 ELSE 0 END)")
             .mkString(" + ")} AS INT) AS decile,
         |    treated, converted
         |  FROM users CROSS JOIN ts),
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
