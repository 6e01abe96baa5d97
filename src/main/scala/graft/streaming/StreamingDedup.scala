package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * @param fnv use the FNV-mode minhash family
    *   ([[graft.functions.TextSketches.minhash_signature_fnv]]) and raw
    *   slot values as the band key — bucket assignment and signatures
    *   then replay exactly in SQL, which is what lets the registered
    *   query carry a DuckDB oracle. Production default stays XXH64.
    * @return streaming frame of (doc_a, doc_b, est_jaccard), doc_a < doc_b
    */
  def nearDupPairs(spark: SparkSession, docs: DataFrame,
      timeCol: String = "created", minEstJaccard: Double = 0.8,
      lifespanDays: Int = 42, fnv: Boolean = false): DataFrame = {
    import spark.implicits._
    val lifespanMs = lifespanDays.toLong * 86400000L

    val sig =
      if (fnv) graft.functions.TextSketches.minhash_signature_fnv(col("text"))
      else graft.functions.TextSketches.minhash_signature(col("text"))
    // band key: a hash of the band's slots (XXH64 mode) or the slot
    // values themselves (FNV mode — same grouping, SQL-replayable)
    def bandKey(b: Int): Column = {
      val slots = (0 until BandRows).map(r =>
        element_at(col("sig"), b * BandRows + r + 1))
      if (fnv) concat_ws("_", slots: _*) else xxhash64(slots: _*).cast("string")
    }
    val banded = docs
      .withWatermark(timeCol, s"$lifespanDays days")
      .select(col("doc_id"), col(timeCol).as("t"), sig.as("sig"))
      .select(col("doc_id"), col("t"), col("sig"),
        explode(array((0 until NumBands).map { b =>
          struct(lit(b).as("band"), bandKey(b).as("key"))
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

  /** CORRECTNESS entry, fully SQL-replayed: the documents table replayed
    * as a stream with synthetic arrival times STRICTLY INCREASING in
    * doc_id, drained in one AvailableNow pass from a single spooled file
    * — so per bucket the processing order is exactly doc_id order (the
    * in-batch (event time, id) sort), residency is "first
    * [[MaxBucketResidents]] by doc_id", and emission is "every resident
    * at the candidate's arrival". All of that is a window function over
    * the FNV-mode signatures, so the ORACLE replays the arrival-order
    * state machine: rank docs per (band, slot-tuple) bucket by doc_id,
    * pair each doc with earlier residents (rn ≤ cap), estimate Jaccard
    * as the fraction of agreeing slots, threshold at 0.7. The XXH64
    * production path keeps its spec coverage (determinism, planted-pair
    * recall, state bound) in StreamingSpec.
    */
  private def fnvReplayOracle: String = {
    val p = graft.functions.TextSketches.P31
    val slots = (0 until NumBands * BandRows).map { j =>
      val a = ((j + 1) * 2654435761L) % p
      val b = ((j + 1) * 2246822519L) % p
      s"min(($a * h + $b) % $p) AS m$j"
    }.mkString(",\n    ")
    val bands = (0 until NumBands).map { b =>
      val ks = (0 until BandRows).map(r =>
        s"m${b * BandRows + r} AS k$r").mkString(", ")
      s"SELECT doc_id, $b AS band, $ks FROM sigs"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until NumBands * BandRows)
      .map(j => s"CASE WHEN x.m$j = y.m$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH RECURSIVE
       |${graft.functions.OracleSql.shingleItems("documents")},
       |${graft.functions.OracleSql.fnvFold("sg")},
       |hh AS (SELECT doc_id, CAST(h % $p AS BIGINT) AS h FROM done),
       |sigs AS (SELECT doc_id,
       |    $slots
       |  FROM hh GROUP BY doc_id),
       |buckets AS (
       |  $bands),
       |ranked AS (
       |  SELECT doc_id, band, k0, k1, k2, k3,
       |    row_number() OVER (PARTITION BY band, k0, k1, k2, k3
       |                       ORDER BY doc_id) AS rn
       |  FROM buckets),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ranked a JOIN ranked b
       |    ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
       |   AND a.k2 = b.k2 AND a.k3 = b.k3
       |   AND a.doc_id < b.doc_id AND a.rn <= $MaxBucketResidents),
       |est AS (
       |  SELECT c.doc_a, c.doc_b, ($agree) / 64.0 AS e
       |  FROM cand c JOIN sigs x ON c.doc_a = x.doc_id
       |              JOIN sigs y ON c.doc_b = y.doc_id)
       |SELECT doc_a, doc_b, round(e, 4) AS est_jaccard
       |FROM est WHERE e >= 0.7""".stripMargin
  }

  private val q = graft.Q(
    "d_streaming_neardup_pairs",
    (s, d) => {
      val stream = StreamingOps.spooledStream(s, s"$d/documents.parquet")
        .select(col("doc_id"), col("text"),
          timestamp_millis(lit(1700000000000L) + col("doc_id") * 60000L)
            .as("created"))
      val name = StreamingOps.sinkName("ndp_")
      StreamingOps.runToMemory(
        nearDupPairs(s, stream, minEstJaccard = 0.7, fnv = true),
        name, OutputMode.Append(),
        StreamingOps.statePartitionsFor(s, s"$d/documents.parquet"))
      s.table(name).dropDuplicates("doc_a", "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(col("est_jaccard"), 4).as("est_jaccard"))
    },
    Some(fnvReplayOracle),
  )

  def queries: Seq[graft.Q] = Seq(q)
}
