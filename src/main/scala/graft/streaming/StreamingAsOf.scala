package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of join — the continuous-ingest twin of
  * `j12_asof_join` / `j12b_asof_native`, completing the as-of family:
  * composed window, custom physical operator, and per-key streaming
  * state, all held to ONE DuckDB ASOF oracle.
  *
  * Shape: both event kinds arrive on one stream; per user, state holds
  * only the LATEST build-side row (time, id) — constant per key, the
  * minimum any streaming as-of can carry — and each probe row emits its
  * match on arrival. Micro-batches are processed in event-time order
  * within each group (sort by (time, kind, id) — views before purchases
  * at equal times, matching `v.ts <= p.ts`), so with time-ordered
  * arrival the drained stream equals the batch join row-for-row.
  * A production deployment adds an event-time TTL exactly like
  * `exemplarStream`'s (state expires `lifespan` past the newest
  * arrival); the parity row keeps NoTimeout so the drained sink is the
  * complete join.
  */
object StreamingAsOf {

  /** @param events (event_id, ts, user_id, event_type) stream; rows with
    *   type "view" build state, rows with type "purchase" probe it.
    * @return append-mode stream of (purchase_id, user_id, view_id).
    */
  def asofStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"),
        when(col("event_type") === "view", 0).otherwise(1).as("kind"))
      .as[(Long, Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Int)],
            state: GroupState[(Long, Long)]) =>
          // (time, kind, id) order: views precede purchases at equal
          // times; among equal-time views the largest id wins — the same
          // deterministic tie-break as AsOfJoinExec's rightTie
          val evs = rows.toVector.sortBy(e => (e._2, e._4, e._3))
          var latest = state.getOption // (view time, view id)
          val out = Vector.newBuilder[(Long, Long, Long)]
          evs.foreach { e =>
            if (e._4 == 0) {
              if (latest.forall(_._1 <= e._2)) latest = Some((e._2, e._3))
            } else latest.foreach { case (_, vid) =>
              out += ((e._3, uid, vid))
            }
          }
          latest.foreach(state.update)
          out.result().iterator
      }
      .toDF("purchase_id", "user_id", "view_id")
  }

  private val parity = graft.Q(
    "j12c_streaming_asof_parity",
    (s, d) => {
      val stream = StreamingOps.spooledStream(s, s"$d/events.parquet")
        .select(col("event_id"),
          // raw spool schema may surface TIMESTAMP_NTZ — normalize like
          // Tables.events (lossless, session timezone is UTC)
          col("ts").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"))
      val name = StreamingOps.sinkName("asofp_")
      StreamingOps.runToMemory(asofStream(s, stream), name,
        OutputMode.Append(),
        StreamingOps.statePartitionsFor(s, s"$d/events.parquet"))
      s.table(name)
    },
    graft.operators.Sessions.asofOracleSql,
  )

  def queries: Seq[graft.Q] = Seq(parity)
}
