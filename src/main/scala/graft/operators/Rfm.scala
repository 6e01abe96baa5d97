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
      li.join(broadcast(fences), Seq("l_returnflag"))
        .groupBy("l_returnflag", "p05", "p95")
        .agg(
          Stable.davg(col("l_extendedprice")).as("mean_raw"),
          count(when(col("l_extendedprice") >= col("p05") &&
            col("l_extendedprice") <= col("p95"), 1)).as("n_kept"),
          (sum(when(col("l_extendedprice") >= col("p05") &&
            col("l_extendedprice") <= col("p95"),
            col("l_extendedprice")
              .cast(org.apache.spark.sql.types.DecimalType(30, 4))))
            .cast("double") /
            count(when(col("l_extendedprice") >= col("p05") &&
              col("l_extendedprice") <= col("p95"), 1)))
            .as("mean_trimmed"),
          Stable.davg(greatest(least(col("l_extendedprice"), col("p95")),
            col("p05"))).as("mean_winsorized"))
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
