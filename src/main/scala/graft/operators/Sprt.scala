package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wald's Sequential Probability Ratio Test (1945) — the sequential
  * A/B monitor that looks at the data EVERY day with controlled error
  * rates (naive daily peeking at a fixed-n test inflates α; SPRT's
  * boundaries make continuous monitoring legitimate). H0: p = [[P0]]
  * vs H1: p = [[P1]] on the daily finalised-order rate; the log
  * likelihood ratio after k successes in n trials is
  * k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)), compared to the Wald bounds
  * ln((1−β)/α), ln(β/(1−α)).
  *
  * Determinism: every logarithm is evaluated ONCE at build time in
  * Scala and embedded as a round-trip double literal in BOTH engines'
  * queries — no runtime `ln` anywhere, so cross-libm drift is
  * impossible. The per-day LLR is exact-integer cumulative counts ×
  * those constants (two multiplies, one add — fixed IEEE order).
  *
  * Scale: one day-keyed aggregate over the fact table, then the
  * cumulative window runs on the |days| spine.
  */
object Sprt {

  val P0 = 0.48
  val P1 = 0.52
  val Alpha = 0.05
  val Beta = 0.05

  /** Round-trip double literals — identical bits when parsed back by
    * either engine.
    */
  val LnWin: String = math.log(P1 / P0).toString
  val LnLoss: String = math.log((1.0 - P1) / (1.0 - P0)).toString
  val UpperA: String = math.log((1.0 - Beta) / Alpha).toString
  val LowerB: String = math.log(Beta / (1.0 - Alpha)).toString

  private val q = Q(
    "a65_sprt_monitor",
    (s, d) => {
      val daily = Tables(s, d).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum((col("o_orderstatus") === "F").cast("long")).as("k"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      daily
        .select(col("day").cast("string").as("day"),
          sum(col("n")).over(w).as("n_cum"),
          sum(col("k")).over(w).as("k_cum"))
        .withColumn("llr", round(
          col("k_cum").cast("double") * lit(LnWin.toDouble) +
            (col("n_cum") - col("k_cum")).cast("double") *
              lit(LnLoss.toDouble), 6))
        .withColumn("decision",
          when(col("llr") >= lit(UpperA.toDouble), "accept_h1")
            .when(col("llr") <= lit(LowerB.toDouble), "accept_h0")
            .otherwise("continue"))
    },
    Some(
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n,
         |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS k
         |  FROM orders GROUP BY 1),
         |cum AS (
         |  SELECT CAST(day AS VARCHAR) AS day,
         |    CAST(sum(n) OVER w AS BIGINT) AS n_cum,
         |    CAST(sum(k) OVER w AS BIGINT) AS k_cum
         |  FROM daily
         |  WINDOW w AS (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |scored AS (
         |  SELECT day, n_cum, k_cum,
         |    round(CAST(k_cum AS DOUBLE) * CAST($LnWin AS DOUBLE)
         |      + CAST(n_cum - k_cum AS DOUBLE) * CAST($LnLoss AS DOUBLE),
         |      6) AS llr
         |  FROM cum)
         |SELECT day, n_cum, k_cum, llr,
         |  CASE WHEN llr >= CAST($UpperA AS DOUBLE) THEN 'accept_h1'
         |       WHEN llr <= CAST($LowerB AS DOUBLE) THEN 'accept_h0'
         |       ELSE 'continue' END AS decision
         |FROM scored""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
