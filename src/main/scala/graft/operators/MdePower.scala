package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._

/** Minimum detectable effect — the experiment-DESIGN row beside a34's
  * Welch readout: given each metric's realised arm sizes and pooled
  * variance, the smallest true lift a two-sided α=0.05 test would
  * catch with 80% power,
  *
  *   MDE = (z_{0.975} + z_{0.80}) · √(s²_pooled · (1/n_c + 1/n_t)).
  *
  * The z quantiles are fixed constants embedded at build time as
  * round-trip double literals (the a65 discipline — no runtime
  * distribution functions, no libm divergence). Stats are the same
  * decimal-stable (n, Σv, Σv²) aggregate a34 uses — one
  * map-side-combinable pass.
  */
object MdePower {

  /** Φ⁻¹(0.975), Φ⁻¹(0.80) — standard normal quantiles. */
  val Z975 = "1.959963984540054"
  val Z80 = "0.8416212335729143"

  private val q = Q(
    "a73_mde_power",
    (s, d) => {
      val e = Tables(s, d).events
        .select(col("event_type"), (col("user_id") % 2).as("arm"),
          col("value"))
      val st = e.groupBy("event_type").agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        Stable.dsum(when(col("arm") === 0, col("value")), 6).as("s1_c"),
        Stable.dsum(when(col("arm") === 0, col("value") * col("value")),
          6).as("s2_c"),
        Stable.dsum(when(col("arm") === 1, col("value")), 6).as("s1_t"),
        Stable.dsum(when(col("arm") === 1, col("value") * col("value")),
          6).as("s2_t"))
      val varC = (col("s2_c") - col("s1_c") * col("s1_c") /
        col("n_c").cast("double")) / (col("n_c") - 1).cast("double")
      val varT = (col("s2_t") - col("s1_t") * col("s1_t") /
        col("n_t").cast("double")) / (col("n_t") - 1).cast("double")
      val pooled = ((col("n_c") - 1).cast("double") * varC +
        (col("n_t") - 1).cast("double") * varT) /
        (col("n_c") + col("n_t") - 2).cast("double")
      st.select(col("event_type"), col("n_c"), col("n_t"),
        round(pooled, 6).as("s2_pooled"),
        round((lit(Z975.toDouble) + lit(Z80.toDouble)) *
          sqrt(pooled * (lit(1.0) / col("n_c").cast("double") +
            lit(1.0) / col("n_t").cast("double"))), 6).as("mde"))
    },
    Some {
      def dsum(expr: String) = Stable.dsumSql(expr, 6)
      s"""WITH st AS (
         |  SELECT event_type,
         |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_c,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_t,
         |    ${dsum("CASE WHEN user_id % 2 = 0 THEN value END")} AS s1_c,
         |    ${dsum("CASE WHEN user_id % 2 = 0 THEN value * value END")}
         |      AS s2_c,
         |    ${dsum("CASE WHEN user_id % 2 = 1 THEN value END")} AS s1_t,
         |    ${dsum("CASE WHEN user_id % 2 = 1 THEN value * value END")}
         |      AS s2_t
         |  FROM events GROUP BY 1),
         |v AS (
         |  SELECT event_type, n_c, n_t,
         |    ((CAST(n_c - 1 AS DOUBLE)
         |        * ((s2_c - s1_c * s1_c / CAST(n_c AS DOUBLE))
         |            / CAST(n_c - 1 AS DOUBLE))
         |      + CAST(n_t - 1 AS DOUBLE)
         |        * ((s2_t - s1_t * s1_t / CAST(n_t AS DOUBLE))
         |            / CAST(n_t - 1 AS DOUBLE)))
         |      / CAST(n_c + n_t - 2 AS DOUBLE)) AS pooled
         |  FROM st)
         |SELECT event_type, n_c, n_t,
         |  round(pooled, 6) AS s2_pooled,
         |  round((CAST($Z975 AS DOUBLE) + CAST($Z80 AS DOUBLE))
         |    * sqrt(pooled * (1.0 / CAST(n_c AS DOUBLE)
         |        + 1.0 / CAST(n_t AS DOUBLE))), 6) AS mde
         |FROM v""".stripMargin
    },
  )

  def all: Seq[Q] = Seq(q)
}
