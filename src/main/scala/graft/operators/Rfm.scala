package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM segmentation — the classic customer-value rollup (recency /
  * frequency / monetary quintiles + a rule-based segment label) over the
  * event stream. The product-analytics sibling of `a22_cohort_retention`
  * (when did they arrive) and `e_kaplan_meier` (how long until they
  * convert): WHO is worth retaining right now.
  *
  * Exactness: recency and frequency are integers; monetary goes through
  * the decimal-stable sum. Quintiles are `ntile(5)` with a UNIQUE
  * ordering key (metric, then user_id), so bucket assignment is
  * deterministic and engine-identical — ntile ties are the classic
  * nondeterminism leak in published RFM jobs. Scale: one user-keyed
  * aggregate over the corpus, then three window passes over the (small)
  * per-user frame; the global windows rank users, not events, and a
  * 1e9-user frame would shard them by tenant/region key first.
  */
object Rfm {

  private val rfm = Q(
    "e_rfm_segments",
    (s, d) => {
      val e = Tables(s, d).events
      val anchor = e.agg(max(col("ts").cast("date")).as("anchor"))
      val perUser = e.groupBy("user_id")
        .agg(max(col("ts").cast("date")).as("last_day"),
          count(lit(1)).as("frequency"),
          Stable.dsum(when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0d))).as("monetary"))
        .crossJoin(broadcast(anchor))
        .withColumn("recency_days",
          datediff(col("anchor"), col("last_day")).cast("long"))
      // score 5 = best: most recent, most frequent, highest spend
      val r = ntile(5).over(Window.orderBy(desc("recency_days"),
        asc("user_id")))
      val f = ntile(5).over(Window.orderBy(asc("frequency"),
        asc("user_id")))
      val m = ntile(5).over(Window.orderBy(asc("monetary"),
        asc("user_id")))
      perUser
        .withColumn("r_score", r).withColumn("f_score", f)
        .withColumn("m_score", m)
        .withColumn("segment",
          when(col("r_score") >= 4 && col("f_score") >= 4 &&
            col("m_score") >= 4, "champion")
            .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
            .when(col("r_score") <= 2, "hibernating")
            .otherwise("regular"))
        .select("user_id", "recency_days", "frequency", "monetary",
          "r_score", "f_score", "m_score", "segment")
    },
    Some(
      s"""WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS anchor
         |               FROM events),
         |u AS (
         |  SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
         |    count(*) AS frequency,
         |    ${Stable.dsumSql(
                "CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")}
         |      AS monetary
         |  FROM events GROUP BY 1),
         |s AS (
         |  SELECT u.user_id,
         |    CAST(date_diff('day', u.last_day, a.anchor) AS BIGINT)
         |      AS recency_days,
         |    u.frequency, u.monetary
         |  FROM u CROSS JOIN anchor a),
         |sc AS (
         |  SELECT user_id, recency_days, frequency, monetary,
         |    CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id)
         |      AS INT) AS r_score,
         |    CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS INT)
         |      AS f_score,
         |    CAST(ntile(5) OVER (ORDER BY monetary, user_id) AS INT)
         |      AS m_score
         |  FROM s)
         |SELECT user_id, recency_days, frequency, monetary,
         |  r_score, f_score, m_score,
         |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
         |       THEN 'champion'
         |       WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
         |       WHEN r_score <= 2 THEN 'hibernating'
         |       ELSE 'regular' END AS segment
         |FROM sc""".stripMargin),
  )

  /** Trimmed + winsorized means — the robust location estimates a
    * published metric wants when `a30_mad_outliers` says the tails are
    * dirty: trimmed drops values outside [p05, p95], winsorized clamps
    * them to the fence. Exact percentiles (the `a4` parity), fences
    * broadcast back, decimal-stable means — three deterministic numbers
    * per group from two passes (one percentile pass, one aggregate),
    * both map-side combinable.
    */
  private val trimmed = Q(
    "a40_trimmed_mean",
    (s, d) => {
      val li = Tables(s, d).lineitem
      // fences via the count-table order statistic (util.OrderStats),
      // not the buffering percentile UDAF: identical interpolation,
      // bounded memory at any group size (SCALING.md)
      val fences = graft.util.OrderStats.percentilesByGroup(
        li.select("l_returnflag", "l_extendedprice"),
        "l_returnflag", "l_extendedprice",
        Seq("p05" -> 0.05, "p95" -> 0.95))
      // Exact fixed-point rewrite (r08, guide §1.2; the a99 discipline):
      // every addend is a ≤4-dp value (2-dp money, or a p05/p95 fence
      // interpolated at k/20 weights → ≤4 dp), so the decimal(30,4)
      // sums are exact integers at scale 4 — computed as longs through
      // util.SplitSum's limb sums instead of three wide-decimal
      // aggregates on the serial scan stage. Identical exact sums →
      // identical means; oracle-checked at sf0.01 (at sf0.1 all three
      // means still match exactly; the fence COLUMNS differ from DuckDB
      // by an interpolation ulp there, pre-existing and unchanged by
      // this rewrite). Measured 2.04 → 1.68 s warm (subset bench).
      import graft.util.SplitSum
      def v4(c: org.apache.spark.sql.Column) = round(c * 10000).cast("long")
      val kept = col("l_extendedprice") >= col("p05") &&
        col("l_extendedprice") <= col("p95")
      li.join(broadcast(fences), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("p05"), col("p95"),
          v4(col("l_extendedprice")).as("vr"),
          when(kept, v4(col("l_extendedprice"))).as("vt"),
          v4(greatest(least(col("l_extendedprice"), col("p95")),
            col("p05"))).as("vw"))
        .groupBy("l_returnflag", "p05", "p95")
        .agg(count(lit(1)).as("n_all"),
          (SplitSum.sums(col("vr"), "sr") ++
            Seq(count(col("vt")).as("n_kept")) ++
            SplitSum.sums(col("vt"), "st") ++
            SplitSum.sums(col("vw"), "sw")): _*)
        .select(col("l_returnflag"), col("p05"), col("p95"),
          (SplitSum.value("sr", 4) / col("n_all")).as("mean_raw"),
          col("n_kept"),
          (SplitSum.value("st", 4) / col("n_kept")).as("mean_trimmed"),
          (SplitSum.value("sw", 4) / col("n_all")).as("mean_winsorized"))
    },
    Some(
      s"""WITH f AS (
         |  SELECT l_returnflag,
         |    quantile_cont(l_extendedprice, 0.05) AS p05,
         |    quantile_cont(l_extendedprice, 0.95) AS p95
         |  FROM lineitem GROUP BY 1)
         |SELECT l.l_returnflag, f.p05, f.p95,
         |  ${Stable.davgSql("l.l_extendedprice")} AS mean_raw,
         |  CAST(count(CASE WHEN l.l_extendedprice >= f.p05
         |    AND l.l_extendedprice <= f.p95 THEN 1 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(SUM(CASE WHEN l.l_extendedprice >= f.p05
         |      AND l.l_extendedprice <= f.p95
         |      THEN CAST(l.l_extendedprice AS DECIMAL(30,4)) END)
         |    AS DOUBLE)
         |    / count(CASE WHEN l.l_extendedprice >= f.p05
         |        AND l.l_extendedprice <= f.p95 THEN 1 END)
         |    AS mean_trimmed,
         |  ${Stable.davgSql(
              "greatest(least(l.l_extendedprice, f.p95), f.p05)")}
         |    AS mean_winsorized
         |FROM lineitem l JOIN f USING (l_returnflag)
         |GROUP BY 1, 2, 3""".stripMargin),
  )

  def queries: Seq[Q] = Seq(rfm, trimmed)
}
