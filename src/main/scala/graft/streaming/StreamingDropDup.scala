package graft.streaming

import graft.Q
import org.apache.spark.sql.functions._

/** `dropDuplicatesWithinWatermark` parity — the Spark 3.5+ dedup
  * operator this engine had not yet exercised: unlike plain
  * streaming `dropDuplicates` (whose key state lives forever unless
  * the EVENT TIME is part of the key), WithinWatermark keeps a key's
  * state only until the watermark passes its arrival, which is the
  * production contract for at-least-once sources (Kafka redeliveries
  * land within seconds; state stays bounded by rate × delay).
  *
  * The fixture doubles the event stream (union with itself — every
  * id arrives exactly twice within the watermark), so the drained
  * dedup must equal the batch DISTINCT, which is what the oracle
  * states: one row per event id, counted per type.
  */
object StreamingDropDup {

  private val parity = Q(
    "d_streaming_dropdup_ttl_parity",
    (s, d) => {
      def src() = StreamingOps.spooledStream(s, s"$d/events.parquet")
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type"),
          col("ts").cast("timestamp").as("ts"))
      val doubled = src().unionAll(src())
      val deduped = doubled
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
      val name = StreamingOps.sinkName("ddw_")
      StreamingOps.runToMemory(deduped, name,
        org.apache.spark.sql.streaming.OutputMode.Append(),
        StreamingOps.statePartitionsFor(s, s"$d/events.parquet"))
      s.table(name).groupBy("event_type")
        .agg(count(lit(1)).as("n_unique"))
    },
    Some(
      """SELECT event_type, count(DISTINCT event_id) AS n_unique
        |FROM events GROUP BY 1""".stripMargin),
  )

  def queries: Seq[Q] = Seq(parity)
}
