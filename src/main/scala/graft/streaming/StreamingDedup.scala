package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming near-duplicate detection — the streaming twin of the batch
  * MinHash-LSH pipeline (`graft.dedup.MinHashDedup`), for the
  * continuous-ingest shape a training-data pipeline actually runs: docs
  * arrive on a stream, and each arrival is checked against what the
  * stream has already seen, incrementally.
  *
  * Design (same blocking discipline as batch, state-bounded):
  *  - the 64-minhash signature is the SAME codegen'd expression the
  *    batch pipeline uses ([[graft.functions.TextSketches]]), computed
  *    map-side on the stream;
  *  - rows fan out to their 16 LSH band buckets; state lives PER BUCKET
  *    (`flatMapGroupsWithState` keyed on (band, key)), so a new arrival
  *    only meets candidates that share a band — never the whole corpus;
  *  - bucket state is CAPPED at [[MaxBucketResidents]] resident
  *    signatures (first-come residency, the hot-bucket analog of the
  *    batch exemplar stage: web-scale boilerplate floods a bucket, and
  *    an unbounded resident list would be an O(k²) state bomb);
  *  - emitted pairs carry the SIGNATURE-estimated Jaccard (fraction of
  *    agreeing minhashes — the standard streaming estimate; the batch
  *    pipeline's exact verify needs both shingle sets, which a stream
  *    cannot hold). Pairs below `minEstJaccard` are suppressed in-state,
  *    so the output stream is already thresholded;
  *  - residency expires via an event-time timeout `lifespan` past the
  *    newest arrival in the bucket — state is bounded by
  *    (arrival rate × lifespan × 16 bands), not stream length.
  *
  * Each unordered pair is emitted at most once per band-bucket; the
  * same pair surfacing through several bands is deduplicated downstream
  * by the consumer (`dropDuplicates("doc_a","doc_b")` on a windowed
  * sink), exactly like the batch candidate `distinct()`.
  */
object StreamingDedup {

  val NumBands = 16
  val BandRows = 4
  val MaxBucketResidents = 64

  case class Resident(id: Long, sig: Array[Long])
  case class BucketState(residents: List[Resident], newestMs: Long)

  case class CandidatePair(doc_a: Long, doc_b: Long, est_jaccard: Double)

  private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var same = 0
    var i = 0
    while (i < a.length && i < b.length) {
      if (a(i) == b(i)) same += 1
      i += 1
    }
    same.toDouble / math.max(a.length, 1)
  }

  /** @param docs streaming frame with (doc_id: long, text: string,
    *   `timeCol`: timestamp)
    * @return streaming frame of (doc_a, doc_b, est_jaccard), doc_a < doc_b
    */
  def nearDupPairs(spark: SparkSession, docs: DataFrame,
      timeCol: String = "created", minEstJaccard: Double = 0.8,
      lifespanDays: Int = 42): DataFrame = {
    import spark.implicits._
    val lifespanMs = lifespanDays.toLong * 86400000L

    val sig = graft.functions.TextSketches.minhash_signature(col("text"))
    val banded = docs
      .withWatermark(timeCol, s"$lifespanDays days")
      .select(col("doc_id"), col(timeCol).as("t"), sig.as("sig"))
      .select(col("doc_id"), col("t"), col("sig"),
        explode(array((0 until NumBands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((0 until BandRows).map(r =>
              element_at(col("sig"), b * BandRows + r + 1)): _*).as("key"))
        }: _*)).as("bk"))
      .select(concat_ws(":", col("bk.band"), col("bk.key")).as("bucket"),
        col("doc_id"), col("t"), col("sig"))
      .as[(String, Long, Timestamp, Array[Long])]

    banded
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[(String, Long, Timestamp, Array[Long])],
            state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic in-batch order: (event time, id)
            val batch = rows.toVector.sortBy(r => (r._3.getTime, r._2))
            var st = state.getOption.getOrElse(BucketState(Nil, 0L))
            val out = Vector.newBuilder[CandidatePair]
            batch.foreach { case (_, id, t, s) =>
              // candidates = current residents (arrivals earlier in this
              // batch are residents by the time later ones are processed)
              st.residents.foreach { r =>
                if (r.id != id) {
                  val est = estJaccard(r.sig, s)
                  if (est >= minEstJaccard)
                    out += CandidatePair(math.min(r.id, id),
                      math.max(r.id, id), est)
                }
              }
              if (st.residents.size < MaxBucketResidents &&
                  !st.residents.exists(_.id == id))
                st = st.copy(residents = st.residents :+ Resident(id, s))
              st = st.copy(newestMs = math.max(st.newestMs, t.getTime))
            }
            state.update(st)
            state.setTimeoutTimestamp(st.newestMs + lifespanMs)
            out.result().iterator
          }
      }
      .toDF("doc_a", "doc_b", "est_jaccard")
  }

  /** Rows-only CORRECTNESS entry: the documents table replayed as a
    * stream (synthetic arrival times from doc_id), near-dup pairs
    * surfacing incrementally. No SQL oracle — the estimate is built on
    * xxhash64 minhashes — so determinism, recall on planted pairs and
    * the state bound are pinned in StreamingSpec instead.
    */
  private val q = graft.Q(
    "d_streaming_neardup_pairs",
    (s, d) => {
      val stream = StreamingOps.spooledStream(s, s"$d/documents.parquet")
        .select(col("doc_id"), col("text"),
          timestamp_millis(lit(1700000000000L) + col("doc_id") * 60000L)
            .as("created"))
      val name = StreamingOps.sinkName("ndp_")
      StreamingOps.runToMemory(
        nearDupPairs(s, stream, minEstJaccard = 0.7),
        name, OutputMode.Append())
      s.table(name).dropDuplicates("doc_a", "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(col("est_jaccard"), 4).as("est_jaccard"))
    },
    None,
  )

  def queries: Seq[graft.Q] = Seq(q)
}
