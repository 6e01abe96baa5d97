package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Interval-overlap join — the interval×interval sibling of
  * `j14_range_join_binned` (point-in-interval). No equi key exists, so a
  * naive formulation is a nested-loop cross product; fixed-width temporal
  * bucketing restores an equi join:
  *
  *   - each interval explodes to the 1-hour buckets it covers
  *     (`sequence(st div W, en div W)`);
  *   - candidates meet on bucket equality — candidate volume is
  *     Σ_b |A_b|·|B_b|, never |A|·|B|;
  *   - each truly-overlapping pair shares ≥1 bucket, and is COUNTED
  *     exactly once by keeping only the bucket containing
  *     `greatest(a.start, b.start)` — that bucket is unique per pair, so
  *     no post-join `distinct` stage is needed (the j14 trick lifted to
  *     interval×interval, where a pair can share many buckets).
  *
  * Registered on user activity sessions (30-minute gap, the `w6`
  * machinery): for every session, how many other-user sessions were
  * concurrently active — the concurrency/co-presence measure. At 100 TB
  * the only corpus-shaped work is the sessionization shuffle; the overlap
  * join shuffles (id, 2×BIGINT bounds) per covered bucket, and W tunes
  * the explode factor against bucket occupancy exactly like LSH band
  * width. The reference has no interval join (its windows are fixed
  * calendars, `dqa/data_getters.py:100-117`); this is a beyond-reference
  * capability.
  */
object IntervalJoin {

  /** 1-hour buckets in microseconds. */
  private val W = 3600L * 1000000L

  private def sessions(t: Tables) = t.events
    .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
    .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
    .select(col("user_id"),
      unix_micros(col("st")).as("st_us"),
      unix_micros(col("en")).as("en_us"),
      col("st"))

  private val overlap = Q(
    "j20_interval_overlap_join",
    (s, d) => {
      val sess = sessions(Tables(s, d))
      val a = sess.select(
        col("user_id").as("a_user"), col("st_us").as("a_st"),
        col("en_us").as("a_en"), col("st").as("session_start"),
        explode(expr(s"sequence(st_us div $W, en_us div $W)")).as("bucket"))
      val b = sess.select(
        col("user_id").as("b_user"), col("st_us").as("b_st"),
        col("en_us").as("b_en"),
        explode(expr(s"sequence(st_us div $W, en_us div $W)")).as("bucket"))
      a.join(b, Seq("bucket"))
        .filter(col("a_user") =!= col("b_user") &&
          col("a_st") <= col("b_en") && col("b_st") <= col("a_en") &&
          // count each overlapping pair in exactly one bucket: the one
          // holding the later of the two starts
          col("bucket") === expr(s"greatest(a_st, b_st) div $W"))
        .groupBy(col("a_user").as("user_id"), col("session_start"))
        .agg(count(lit(1)).as("n_concurrent"))
    },
    Some(
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        |  FROM events),
        |islands AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked),
        |s AS (SELECT user_id, min(ts) AS st, max(ts) AS en
        |      FROM islands GROUP BY user_id, sid)
        |SELECT a.user_id, a.st AS session_start,
        |  count(*) AS n_concurrent
        |FROM s a JOIN s b
        |  ON a.user_id <> b.user_id AND a.st <= b.en AND b.st <= a.en
        |GROUP BY 1, 2""".stripMargin),
  )

  /** The same session-concurrency result through the native plane-sweep
    * exec ([[graft.plans.IntervalOverlapJoin]]): buckets stay the equi
    * key (they ARE the distribution answer for a keyless interval join),
    * but WITHIN each bucket the sweep emits only true overlaps — the
    * composed form materialises every co-bucketed pair and filters,
    * paying |A_b|·|B_b| on dense buckets where the sweep pays
    * output + concurrency. Same unique-bucket dedup rule, same oracle.
    */
  private val overlapNative = Q(
    "j20b_interval_native",
    (s, d) => {
      val sess = sessions(Tables(s, d))
      val a = sess.select(
        col("user_id").as("a_user"), col("st_us").as("a_st"),
        col("en_us").as("a_en"), col("st").as("session_start"),
        explode(expr(s"sequence(st_us div $W, en_us div $W)"))
          .as("a_bucket"))
      val b = sess.select(
        col("user_id").as("b_user"), col("st_us").as("b_st"),
        col("en_us").as("b_en"),
        explode(expr(s"sequence(st_us div $W, en_us div $W)"))
          .as("b_bucket"))
      graft.plans.IntervalOverlapJoin.overlap(a, b,
          Seq("a_bucket"), Seq("b_bucket"),
          "a_st", "a_en", "b_st", "b_en")
        .filter(col("a_user") =!= col("b_user") &&
          col("a_bucket") === expr(s"greatest(a_st, b_st) div $W"))
        .groupBy(col("a_user").as("user_id"), col("session_start"))
        .agg(count(lit(1)).as("n_concurrent"))
    },
    overlap.oracle, // identical semantics, shared oracle
  )

  def all: Seq[Q] = Seq(overlap, overlapNative)
}
