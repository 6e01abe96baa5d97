package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Advanced windowing beyond the reference's fixed sliding windows:
  * gap-based sessionization (Spark `session_window`) and multi-level
  * aggregation (cube / grouping sets) — capabilities a labour-market
  * analytics engine needs even though the reference hand-rolled none of
  * them.
  */
object Sessions {

  private val sessions = Q(
    "w6_session_windows",
    (s, d) =>
      // per-user sessions with a 30-minute inactivity gap; session start
      // is the first event's timestamp (matches the islands oracle)
      Tables(s, d).events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          graft.util.Stable.dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("n_events"), col("sum_value")),
    Some(
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
         |           <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
         |  FROM events),
         |islands AS (
         |  SELECT user_id, ts, value,
         |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM marked)
         |SELECT user_id, min(ts) AS session_start,
         |  count(*) AS n_events,
         |  ${graft.util.Stable.dsumSql("value")} AS sum_value
         |FROM islands GROUP BY user_id, sid""".stripMargin),
  )

  private val cubeQ = Q(
    "a14_cube_rollup",
    (s, d) =>
      // multi-level totals in one pass: (priority, status), (priority),
      // (status), () — with grouping_id to disambiguate null group keys
      Tables(s, d).orders
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .select("o_orderpriority", "o_orderstatus", "n", "gid"),
    Some(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
        |    AS BIGINT) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin),
  )

  def all: Seq[Q] = Seq(sessions, cubeQ)
}
