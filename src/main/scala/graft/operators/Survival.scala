package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — time-to-conversion with right
  * censoring, the event-analytics operator beside the cohort-retention
  * matrix (`a22`) and the funnel (`e_funnel_steps`): "how long until a
  * user makes a big purchase, given that many never do". Naive
  * averaging over converters only is biased (it silently drops the
  * censored users); the product-limit estimator is the standard fix.
  *
  * Semantics: per user, duration = days from first activity to the
  * first purchase with value > [[BigPurchase]]; users with none are
  * right-CENSORED at their last activity (they contribute at-risk time,
  * not an event). At each event time t: n_t = users with observed
  * duration ≥ t, d_t = conversions at t, S(t) = Π_{t'≤t}
  * (n_{t'} − d_{t'})/n_{t'}.
  *
  * INTEGER-EXACT: the product is the floor-division recurrence
  * s_i = s_{i−1}·(n_i − d_i) div n_i in ppm units (s_0 = 10⁶) — a float
  * product would be accumulation-order-negotiable; the integer
  * trajectory is bit-identical on any engine and replays as a recursive
  * CTE. Sequential-by-definition, so it runs as a bounded fold
  * (`aggregate` HOF) over the ≤|distinct durations| ordered rows — the
  * CUSUM discipline: the corpus reduces FIRST, the recurrence touches
  * metadata.
  *
  * Scale shape: ONE user-keyed aggregate over the events scan is the
  * only corpus-sized shuffle; the suffix-sum window and the fold run on
  * ≤ observation-span rows.
  */
object Survival {

  private val BigPurchase = 90.0

  private val km = Q(
    "e_kaplan_meier",
    (s, d) => {
      val e = Tables(s, d).events.select(col("user_id"),
        col("ts").cast("date").as("day"),
        col("event_type"), col("value"))
      val users = e.groupBy("user_id")
        .agg(min(col("day")).as("first_day"),
          max(col("day")).as("last_day"),
          min(when(col("event_type") === "purchase" &&
            col("value") > BigPurchase, col("day"))).as("conv_day"))
        .select(
          datediff(coalesce(col("conv_day"), col("last_day")),
            col("first_day")).cast("long").as("dur"),
          when(col("conv_day").isNotNull, lit(1L)).otherwise(lit(0L))
            .as("event"))
      val byDur = users.groupBy("dur")
        .agg(sum(col("event")).as("d"), count(lit(1)).as("tot"))
      // n_t = Σ tot over durations >= t: a suffix sum over the ≤|span|
      // distinct-duration rows (single-task window on metadata is the
      // intended shape here)
      val w = Window.orderBy(desc("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val deaths = byDur.withColumn("n", sum(col("tot")).over(w))
        .filter(col("d") > 0).select("dur", "d", "n")
      // the sequential product-limit recurrence as a bounded array fold
      deaths
        .agg(sort_array(collect_list(struct(col("dur"), col("d"),
          col("n")))).as("xs"))
        .select(explode(expr(
          """aggregate(xs,
            |  named_struct('s', CAST(1000000 AS BIGINT),
            |    'out', CAST(array() AS
            |      ARRAY<STRUCT<dur: BIGINT, d: BIGINT, n: BIGINT,
            |                   s: BIGINT>>)),
            |  (acc, x) -> named_struct(
            |    's', acc.s * (x.n - x.d) div x.n,
            |    'out', concat(acc.out, array(named_struct(
            |      'dur', x.dur, 'd', x.d, 'n', x.n,
            |      's', acc.s * (x.n - x.d) div x.n)))),
            |  acc -> acc.out)""".stripMargin)).as("r"))
        .select(col("r.dur").as("duration_days"),
          col("r.n").as("n_at_risk"),
          col("r.d").as("n_conversions"),
          col("r.s").as("survival_ppm"))
    },
    Some(
      s"""WITH RECURSIVE u AS (
         |  SELECT user_id,
         |    CAST(date_diff('day', min(CAST(ts AS DATE)),
         |      coalesce(
         |        min(CASE WHEN event_type = 'purchase'
         |              AND value > $BigPurchase
         |            THEN CAST(ts AS DATE) END),
         |        max(CAST(ts AS DATE)))) AS BIGINT) AS dur,
         |    CASE WHEN min(CASE WHEN event_type = 'purchase'
         |              AND value > $BigPurchase
         |            THEN CAST(ts AS DATE) END) IS NOT NULL
         |      THEN 1 ELSE 0 END AS event
         |  FROM events GROUP BY user_id),
         |bydur AS (
         |  SELECT dur, CAST(sum(event) AS BIGINT) AS d,
         |    count(*) AS tot
         |  FROM u GROUP BY dur),
         |risk AS (
         |  SELECT dur, d,
         |    CAST(sum(tot) OVER (ORDER BY dur DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS n
         |  FROM bydur),
         |deaths AS (
         |  SELECT dur, d, n, row_number() OVER (ORDER BY dur) AS rn
         |  FROM risk WHERE d > 0),
         |rec AS (
         |  SELECT rn, dur, d, n,
         |    CAST(1000000 * (n - d) // n AS BIGINT) AS s
         |  FROM deaths WHERE rn = 1
         |  UNION ALL
         |  SELECT x.rn, x.dur, x.d, x.n,
         |    CAST(r.s * (x.n - x.d) // x.n AS BIGINT)
         |  FROM deaths x JOIN rec r ON x.rn = r.rn + 1)
         |SELECT dur AS duration_days, n AS n_at_risk,
         |  d AS n_conversions, s AS survival_ppm
         |FROM rec""".stripMargin),
  )

  def all: Seq[Q] = Seq(km)
}
