package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Bayesian A/B readout, normal approximation — the stakeholder
  * number ("probability treatment beats control") the frequentist
  * rows (a34 t, a73 MDE, a95 FDR) never produce: with flat priors
  * and n in the thousands, each arm's conversion-rate posterior is
  * N(p̂, p̂(1−p̂)/n), so
  *
  *   P(B > A) = Φ( (p̂B − p̂A) / √(SE²A + SE²B) )
  *
  * with Φ the SAME A&S polynomial a95 introduced (one IEEE chain,
  * engine-identical — the two-branch CASE handles z's sign since the
  * polynomial is stated for z ≥ 0). Conversion = purchase event;
  * arms = user_id parity (the SRM/a34 assignment). Also reports the
  * expected-loss-adjacent `p_a_beats_b` complement so a decision
  * gate can read either direction.
  *
  * Shape: ONE per-user flag aggregate, ONE 4-number conditional
  * reduce, 1-row arithmetic. One scan at any scale.
  */
object BayesAb {

  private val q = Q(
    "e_bayes_ab_normal",
    (s, d) => {
      val users = Tables(s, d).events
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 90.0, 1L).otherwise(0L)).as("conv"))
        .select((col("user_id") % 2).as("arm"), col("conv"))
      val red = users.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("cb"))
        .withColumn("pa", expr("CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"))
        .withColumn("pb", expr("CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)"))
        .withColumn("z", expr(
          "(pb - pa) / sqrt(pa * (1.0 - pa) / CAST(na AS DOUBLE) " +
            "+ pb * (1.0 - pb) / CAST(nb AS DOUBLE))"))
        .withColumn("az", abs(col("z")))
        .withColumn("qt", expr(MultipleTesting.QTail))
      red.selectExpr("na", "nb",
        "round(pa, 6) AS p_control",
        "round(pb, 6) AS p_treatment",
        "round(z, 6) AS z",
        "round(CASE WHEN z >= 0 THEN 1.0 - qt ELSE qt END, 9) AS p_b_beats_a",
        "round(CASE WHEN z >= 0 THEN qt ELSE 1.0 - qt END, 9) AS p_a_beats_b")
    },
    Some(
      s"""WITH users AS (
         |  SELECT user_id % 2 AS arm,
         |    max(CASE WHEN event_type = 'purchase' AND value > 90.0
         |        THEN 1 ELSE 0 END) AS conv
         |  FROM events GROUP BY user_id),
         |red AS (
         |  SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
         |      AS ca,
         |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
         |      AS cb
         |  FROM users),
         |m0 AS (
         |  SELECT *, CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
         |    CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb
         |  FROM red),
         |m1 AS (
         |  SELECT *,
         |    (pb - pa) / sqrt(pa * (1.0 - pa) / CAST(na AS DOUBLE)
         |      + pb * (1.0 - pb) / CAST(nb AS DOUBLE)) AS z
         |  FROM m0),
         |m2 AS (SELECT *, abs(z) AS az FROM m1),
         |m3 AS (SELECT *, ${MultipleTesting.QTail} AS qt FROM m2)
         |SELECT na, nb, round(pa, 6) AS p_control,
         |  round(pb, 6) AS p_treatment, round(z, 6) AS z,
         |  round(CASE WHEN z >= 0 THEN 1.0 - qt ELSE qt END, 9)
         |    AS p_b_beats_a,
         |  round(CASE WHEN z >= 0 THEN qt ELSE 1.0 - qt END, 9)
         |    AS p_a_beats_b
         |FROM m3""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
