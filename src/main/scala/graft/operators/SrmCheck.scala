package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sample-ratio-mismatch audit — the FIRST gate any experiment
  * readout must pass (a skewed split invalidates a34/a51/a72/a73
  * before they run): are the realised arm sizes consistent with the
  * designed 50/50 allocation? Per metric,
  *
  *   χ²₁ = (n_c − n_t)² / (n_c + n_t)
  *
  * (the 2-cell goodness-of-fit against equal expectation, in its
  * cancelled exact-integer form). EXACT: one conditional BIGINT
  * aggregate per event type — numerator and denominator integral,
  * one IEEE divide. Flags `srm = true` above the χ²₁ 0.001 critical
  * value 10.828 (a build-time constant, the a65/a73 discipline —
  * SRM alerts use a tight α because the test runs on every metric
  * every day).
  */
object SrmCheck {

  /** χ²₁ critical value at α = 0.001. */
  val Crit = "10.827566170662733"

  private val q = Q(
    "e_srm_check",
    (s, d) => {
      Tables(s, d).events
        .select(col("event_type"), (col("user_id") % 2).as("arm"))
        .groupBy("event_type")
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"))
        .select(col("event_type"), col("n_c"), col("n_t"),
          round((col("n_c") - col("n_t")).cast("double") *
            (col("n_c") - col("n_t")).cast("double") /
            (col("n_c") + col("n_t")).cast("double"), 6).as("chi2"),
          ((col("n_c") - col("n_t")).cast("double") *
            (col("n_c") - col("n_t")).cast("double") /
            (col("n_c") + col("n_t")).cast("double") >
            lit(Crit.toDouble)).as("srm"))
        .orderBy("event_type")
    },
    Some(
      s"""SELECT event_type,
         |  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_c,
         |  CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_t,
         |  round(CAST((sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         |      - sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END))
         |      * (sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         |      - sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END))
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS chi2,
         |  (CAST((sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         |      - sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END))
         |      * (sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         |      - sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END))
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE))
         |    > CAST($Crit AS DOUBLE) AS srm
         |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
