package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming/batch parity: the sliding stock window over the events
  * table must produce identical results through the streaming path
  * (file source → watermark → window agg → memory sink) and the batch
  * path.
  */
class StreamingSpec extends SparkSpec {

  // generator versions have shipped ts as long-of-nanos (read via
  // nanosAsLong) and as TIMESTAMP_NTZ — take the schema from the file
  // and normalize either shape to a session-zoned `created` column
  private lazy val eventsSchema: StructType =
    spark.read.parquet(sf("sf0.001") + "/events.parquet").schema

  private def asTs(df: org.apache.spark.sql.DataFrame) =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("created", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("created", col("ts").cast(TimestampType))
      case _ => df.withColumn("created", col("ts"))
    }

  // the file stream source requires a directory, not a single file
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf("sf0.001") + "/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming sliding window equals batch sliding window") {
    val dir = sf("sf0.001")
    val stream = spark.readStream.schema(eventsSchema)
      .parquet(eventsDir)
    val agg = StreamingOps.slidingStock(asTs(stream),
      length = "7 days", slide = "1 day", watermark = "7 days")
    StreamingOps.runToMemory(agg, "stock_out")
    val got = spark.sql("select ws, n from stock_out").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSet

    val batch = asTs(spark.read.parquet(dir + "/events.parquet"))
      .groupBy(window(col("created"), "7 days", "1 day"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("date").as("ws"), col("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet

    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("streaming dedup drops repeated ids like batch distinct") {
    val stream = spark.readStream.schema(eventsSchema)
      .parquet(eventsDir)
    // user_id repeats across events: dedup on it keeps one row per
    // (user_id, created) pair — compare against batch dropDuplicates
    val deduped = StreamingOps.streamingDedup(asTs(stream),
      Seq("user_id"), watermark = "40 days")
      .select("user_id", "created")
    StreamingOps.runToMemory(deduped, "dedup_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.sql("select count(*) from dedup_out").head().getLong(0)

    val want = asTs(spark.read.parquet(sf("sf0.001") + "/events.parquet"))
      .dropDuplicates("user_id", "created").count()
    assert(got == want)
    assert(got > 0)
  }

  test("mapGroupsWithState accumulates per-key counts") {
    val dir = sf("sf0.001")
    val stream = spark.readStream.schema(eventsSchema)
      .parquet(eventsDir)
    val counted = StreamingOps.runningCounts(spark, asTs(stream),
      "event_type", "created")
    StreamingOps.runToMemory(counted, "state_out",
      org.apache.spark.sql.streaming.OutputMode.Update())
    val got = spark.sql("select key, n from state_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val want = spark.read.parquet(dir + "/events.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // state rows are emitted per batch; with AvailableNow the final
    // update per key must match the batch counts
    assert(got == want)
  }

  test("flatMapGroupsWithState exemplar stream matches batch min-rule") {
    val dir = sf("sf0.001")
    val stream = spark.readStream.schema(eventsSchema)
      .parquet(eventsDir)
    // content key = event_type: few keys, many arrivals per key
    val out = StreamingOps.exemplarStream(spark, asTs(stream),
      keyCol = "event_type", idCol = "event_id")
    StreamingOps.runToMemory(out, "exemplar_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.sql("select id, is_duplicate from exemplar_out")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
      .orderBy(col("created"), col("event_id").cast("string"))
    val want = asTs(spark.read.parquet(dir + "/events.parquet"))
      .withColumn("rn", row_number().over(w))
      .select(col("event_id").cast("string").as("id"),
        (col("rn") > 1).as("is_duplicate"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == want)
    assert(got.values.exists(_ == true) && got.values.exists(_ == false))
  }

  test("streaming weekly stock (dedup -> window) equals batch composition") {
    val dir = sf("sf0.001")
    val stream = spark.readStream.schema(eventsSchema)
      .parquet(eventsDir)
    val agg = StreamingOps.weeklyStockStream(asTs(stream),
      Seq("user_id"), watermark = "42 days")
    StreamingOps.runToMemory(agg, "weekly_out") // Complete: all windows
    val got = spark.sql("select ws, n from weekly_out").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSet

    val want = asTs(spark.read.parquet(dir + "/events.parquet"))
      .dropDuplicates("user_id", "created")
      .groupBy(window(col("created"), "42 days", "7 days"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("date").as("ws"), col("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming grouped top-k equals batch grouped top-k") {
    val stream = spark.readStream.schema(eventsSchema).parquet(eventsDir)
    val topk = StreamingOps.topKStream(asTs(stream),
      "event_type", "value", "event_id", k = 3)
    StreamingOps.runToMemory(topk, "topk_out")
    def flat(rows: Array[org.apache.spark.sql.Row]) = rows.flatMap { r =>
      r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (r.getString(0), e.getDouble(0), e.getLong(1)))
    }.toSet
    val got = flat(spark.sql("select * from topk_out").collect())

    val batch = asTs(spark.read.parquet(sf("sf0.001") + "/events.parquet"))
    val want = flat(StreamingOps.topKStream(batch,
      "event_type", "value", "event_id", k = 3).collect())
    assert(got == want)
    assert(got.nonEmpty && got.size >= 3)
  }

  test("streaming near-dup: planted pairs surface, unrelated don't, " +
    "flooded buckets stay bounded") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val near = base.replace("tau", "taux") // one shingle's difference
    val unrelated = (1 to 20).map(i => s"w${i}a w${i}b w${i}c").mkString(" ")
    // flood: 100 identical docs land in the SAME 16 buckets — the
    // resident cap must keep state and output bounded (batch analog:
    // the exemplar stage-0 hardening)
    val flood = (100L until 200L).map(i =>
      (i, "copy of the same boilerplate text repeated verbatim", ts(i)))
    val rows = Seq(
      (1L, base, ts(1)), (2L, near, ts(2)), (3L, unrelated, ts(3))
    ) ++ flood
    val dir = java.nio.file.Files.createTempDirectory("neardup_stream")
    rows.toDF("doc_id", "text", "created")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)

    val stream = spark.readStream
      .schema(spark.read.parquet(dir.toString).schema)
      .parquet(dir.toString)
    val pairs = StreamingDedup.nearDupPairs(spark, stream,
      minEstJaccard = 0.5)
    StreamingOps.runToMemory(pairs, "neardup_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("neardup_out")
      .select("doc_a", "doc_b", "est_jaccard")
      .dropDuplicates("doc_a", "doc_b").collect()

    val planted = got.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(planted.isDefined, s"planted near-dup not found in ${got.toSeq}")
    assert(planted.get.getDouble(2) >= 0.5)
    assert(!got.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L),
      "unrelated doc must pair with nobody")
    // flood: candidate pairs bounded by the resident cap, not O(k²) —
    // each arrival meets at most MaxBucketResidents residents
    val floodPairs = got.count(r => r.getLong(0) >= 100L)
    val cap = StreamingDedup.MaxBucketResidents
    assert(floodPairs <= cap * (cap - 1) / 2 + cap * (100 - cap),
      s"flood emitted $floodPairs pairs")
    assert(floodPairs > 0, "exact copies are near-dups and must surface")
  }

  test("timer sessions merge a cross-batch bridge event (within watermark)") {
    // the r6 advice scenario: batch 1 delivers t=0 and t=50min (gap 30min
    // ⇒ looks like two sessions), batch 2 delivers the BRIDGE at t=20min,
    // admissible under a 2h watermark delay. Batch session_window sees ONE
    // session of 3 events; an eager-close processor has already emitted
    // the first session and cannot take it back (Append rows are final).
    // The buffered-until-watermark processor must emit exactly one row.
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    try {
      val watch = java.nio.file.Files.createTempDirectory("sess_bridge")
      val base = 1700000000000L
      def mins(m: Long) = new java.sql.Timestamp(base + m * 60000L)
      // one file per micro-batch (maxFilesPerTrigger=1), ordered by mtime
      def stage(i: Int, rows: Seq[(Long, java.sql.Timestamp)]): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory(s"sb_$i")
        rows.toDF("user_id", "ts").coalesce(1).write
          .mode("overwrite").parquet(tmp.toString)
        import scala.jdk.CollectionConverters._
        val src = java.nio.file.Files.list(tmp).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        val dst = watch.resolve(f"part-$i%03d.parquet")
        java.nio.file.Files.copy(src, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
      }
      val sentinel = new java.sql.Timestamp(base + 365L * 86400000L)
      stage(0, Seq((1L, mins(0)), (1L, mins(50))))
      stage(1, Seq((1L, mins(20)))) // the bridge
      stage(2, Seq((-1L, sentinel))) // raise the watermark…
      stage(3, Seq((-1L, sentinel))) // …and give eviction a final batch
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("ts", TimestampType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(watch.toString)
        .withWatermark("ts", "2 hours")
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"))
        .as[(Long, java.sql.Timestamp, Long)]
      val out = stream.groupByKey(_._1)
        .transformWithState(
          new StreamingOps.SessionProcessor(30L * 60 * 1000000),
          TimeMode.EventTime(), OutputMode.Append())
        .toDF("user_id", "session_start_us", "n_events")
      val name = StreamingOps.sinkName("sessbridge_")
      StreamingOps.runToMemory(out, name, OutputMode.Append())
      val got = spark.table(name).filter(col("user_id") >= 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == Seq((1L, base * 1000L, 3L)),
        s"expected one bridged session of 3 events, got ${got.toSeq}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  private def ts(i: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + i * 60000L)
}
