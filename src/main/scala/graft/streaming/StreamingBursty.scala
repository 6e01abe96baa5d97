package graft.streaming

import graft.Q
import graft.text.BurstyTerms
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-term trailing batch counts held in stream state. Only the last
  * [[BurstyTerms.TrailBatches]]+1 batch counters survive per term (the
  * horizon prune in the group function), so resident state ∝ active
  * vocabulary × window, not stream length.
  */
final case class BurstyState(counts: Map[Long, Long])

/** Streaming twin of [[BurstyTerms]] (`t_bursty_terms`): the trending-
  * terms detector as a STATEFUL stream — tokens keyed by term flow
  * through `flatMapGroupsWithState`, whose state is the term's trailing
  * batch counters; each emitted (term, batch) row carries its count and
  * the trailing-4 sum read from state. The batch-side finish (the tiny
  * |batches| spine, the smoothed ppm ratio, top-30) joins AFTER the
  * sink, exactly as the batch query does — so hash-equality against the
  * batch oracle proves the stateful path computes the same trailing
  * sums the RANGE frames do.
  */
object StreamingBursty {

  import BurstyTerms.{BatchSize, TrailBatches, MinCount, TopN, Ppm}

  /** (term, batch, c, trail_c) from stream state. */
  def burstyStream(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(expr(s"doc_id div $BatchSize").as("batch"),
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) >= 3)
      .as[(Long, String)]
      .groupByKey(_._2)
      // NoTimeout for the AvailableNow parity drain: a processing-time
      // timer would keep the no-data batch loop alive indefinitely under
      // AvailableNow (measured: endless state commits). An always-on
      // deployment hangs eviction off the batch-number horizon below
      // instead — the counter prune IS the TTL.
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (term: String, rows: Iterator[(Long, String)],
            state: GroupState[BurstyState]) => {
            val arrived = rows.foldLeft(Map.empty[Long, Long]) {
              case (m, (b, _)) => m.updated(b, m.getOrElse(b, 0L) + 1L)
            }
            val merged = state.getOption.map(_.counts).getOrElse(Map.empty)
              .foldLeft(arrived) { case (m, (b, c)) =>
                m.updated(b, m.getOrElse(b, 0L) + c)
              }
            // emit one row per batch ARRIVED this trigger, trailing sum
            // over the merged counters (batch replay: one trigger sees
            // everything, so this equals the RANGE-frame sums)
            val out = arrived.keysIterator.map { b =>
              val trail = merged.iterator.collect {
                case (b2, c2) if b2 >= b - TrailBatches && b2 < b => c2
              }.sum
              (term, b, merged(b), trail)
            }.toVector
            // production prune: counters older than any batch still able
            // to appear in a trailing window are dead weight
            val horizon = merged.keysIterator.max - TrailBatches
            state.update(BurstyState(merged.filter(_._1 >= horizon)))
            out.iterator
        }
      }
      .toDF("term", "batch", "c", "trail_c")
  }

  private val q = Q(
    "t_streaming_bursty_parity",
    (s, d) => {
      val stream = StreamingOps.spooledStream(s, s"$d/documents.parquet")
      val name = StreamingOps.sinkName("tb_")
      StreamingOps.runToMemory(burstyStream(s, stream), name,
        OutputMode.Append(),
        StreamingOps.statePartitionsFor(s, s"$d/documents.parquet"))
      // batch-side finish on the tiny spine, identical to t_bursty_terms
      val tok = s.read.parquet(s"$d/documents.parquet")
        .select(expr(s"doc_id div $BatchSize").as("batch"),
          explode(split(lower(col("text")), " ")).as("term"))
        .filter(length(col("term")) >= 3)
      val wB = Window.orderBy("batch").rangeBetween(-TrailBatches, -1)
      val spine = tok.groupBy("batch").agg(count(lit(1)).as("tok"))
        .select(col("batch"), col("tok"),
          coalesce(sum(col("tok")).over(wB), lit(0L)).as("trail_tok"))
      s.table(name)
        .join(broadcast(spine), "batch")
        .filter(col("c") >= MinCount)
        .select(col("term"), col("batch"), col("c"), col("trail_c"),
          expr(s"($Ppm * c * (trail_tok + 1)) div (tok * (trail_c + 1))")
            .as("burst_ppm"))
        .orderBy(col("burst_ppm").desc, col("term"), col("batch"))
        .limit(TopN)
    },
    Some(BurstyTerms.oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
