package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/featurized per partition.
  *
  * The image/audio decode libraries are not in this container, so
  * `decodeStub` is a clearly-marked deterministic fake — but the
  * Spark-side shape is real: binary column + metadata struct in, batched
  * per-partition transform (the Scala analog of `mapInPandas` — one
  * decoder init per partition, not per row), fixed-width feature schema
  * out. Swapping the stub for a JNI/ONNX decoder changes no plumbing.
  */
object MultimodalQueries {

  case class MediaFeature(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, checksum: Long)

  /** STUB decoder: stands in for image decode + feature extraction.
    * Deterministic function of the payload bytes only.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    // ??? real decoder goes here (e.g. JPEG dims + embedding); faked as:
    val w = 16 + (if (payload.isEmpty) 0 else (payload(0) & 0x3F))
    val h = 16 + (if (payload.length < 2) 0 else (payload(1) & 0x3F))
    var ck = 1469598103934665603L // FNV-1a over the payload
    payload.foreach { b => ck ^= (b & 0xFFL); ck *= 1099511628211L }
    (w, h, ck)
  }

  /** Binary payloads → per-partition batched feature extraction.
    * Batching mirrors `mapInPandas` semantics: the decoder sees
    * fixed-size batches (one vectorised call per `BatchSize` payloads),
    * initialised once per partition — swap `decodeStub` for a JNI/ONNX
    * batch decoder without touching the plumbing.
    */
  val BatchSize = 32

  def extractFeatures(docsWithPayload: DataFrame): Dataset[MediaFeature] = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point for a real decoder
        it.grouped(BatchSize).flatMap { batch =>
          // one "vectorised" decode call per batch
          batch.map { case (id, bytes) =>
            val (w, h, ck) = decodeStub(bytes)
            MediaFeature(id, bytes.length, w, h, ck)
          }
        }
      }
  }

  /** STUB resize: deterministic box-downsample of the payload to a
    * `w`×`h` byte grid (stands in for image resize; output schema and
    * batching are the real contract).
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // ??? real image resize goes here; faked as byte-grid box sampling
    val out = new Array[Byte](w * h)
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = payload((i.toLong * payload.length / out.length).toInt)
        i += 1
      }
    }
    out
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame sampler: every `stride`-th fixed-size chunk of a "video"
    * payload becomes a frame row — the generator (UDTF) shape: one input
    * row explodes into many typed frame rows, batched per partition.
    */
  def sampleFrames(docsWithPayload: DataFrame, frameBytes: Int = 64,
      stride: Int = 4): Dataset[Frame] = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes
          (0 until nFrames by stride).map { f =>
            Frame(id, f, java.util.Arrays.copyOfRange(
              bytes, f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
  }

  private val meta = Q(
    "m_binary_metadata",
    (s, d) =>
      // typed metadata over an opaque binary column — oracle-checkable
      Tables(s, d).documents
        .select(col("doc_id"),
          octet_length(col("text").cast("binary")).as("n_bytes"),
          substring(base64(col("text").cast("binary")), 1, 16).as("b64_prefix")),
    Some(
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  substr(to_base64(CAST(text AS BLOB)), 1, 16) AS b64_prefix
        |FROM documents""".stripMargin),
  )

  private val feats = Q(
    "m_decode_features",
    (s, d) =>
      extractFeatures(
        Tables(s, d).documents
          .select(col("doc_id"), col("text").cast("binary").as("payload")))
        .toDF(),
    // FNV-1a's 64-bit wrapping multiply replayed in DuckDB: the fold is
    // sequential per payload, so a recursive CTE advances every document
    // one byte per step, carrying the checksum as HUGEINT mod 2^64
    // (ck < 2^64 and the multiplier < 2^41, so the product fits in 128
    // bits). The xor touches only the low byte (b < 256), done on the
    // BIGINT-safe low chunk. Payloads are ASCII text bytes, so
    // ord(char) == the byte the Scala side folds.
    Some(
      """WITH RECURSIVE fnv(doc_id, i, ck) AS (
        |  SELECT doc_id, 0, CAST('1469598103934665603' AS HUGEINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT f.doc_id, f.i + 1,
        |    ((f.ck // 256) * 256
        |      + xor(CAST(f.ck % 256 AS BIGINT),
        |            CAST(ord(substr(d.text, f.i + 1, 1)) AS BIGINT)))
        |    * 1099511628211 % CAST('18446744073709551616' AS HUGEINT)
        |  FROM fnv f JOIN documents d ON f.doc_id = d.doc_id
        |  WHERE f.i < strlen(d.text))
        |SELECT f.doc_id,
        |  CAST(strlen(d.text) AS INT) AS n_bytes,
        |  CAST(16 + CASE WHEN strlen(d.text) = 0 THEN 0
        |    ELSE ord(substr(d.text, 1, 1)) & 63 END AS INT) AS width,
        |  CAST(16 + CASE WHEN strlen(d.text) < 2 THEN 0
        |    ELSE ord(substr(d.text, 2, 1)) & 63 END AS INT) AS height,
        |  CAST(CASE WHEN f.ck >= CAST('9223372036854775808' AS HUGEINT)
        |    THEN f.ck - CAST('18446744073709551616' AS HUGEINT)
        |    ELSE f.ck END AS BIGINT) AS checksum
        |FROM fnv f JOIN documents d ON f.doc_id = d.doc_id
        |WHERE f.i = strlen(d.text)""".stripMargin),
  )

  // the DIMENSION half of the stub decode is byte arithmetic on the
  // payload, so the mapPartitions batching contract gets a hash-checked
  // row too (the FNV checksum column stays spec-verified — 64-bit
  // wrapping multiply has no clean DuckDB form)
  private val dims = Q(
    "m_decode_dims",
    (s, d) =>
      extractFeatures(
        Tables(s, d).documents
          .select(col("doc_id"), col("text").cast("binary").as("payload")))
        .toDF()
        .select("doc_id", "n_bytes", "width", "height"),
    Some(
      """SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes,
        |  CAST(16 + CASE WHEN strlen(text) = 0 THEN 0
        |    ELSE ord(substr(text, 1, 1)) & 63 END AS INT) AS width,
        |  CAST(16 + CASE WHEN strlen(text) < 2 THEN 0
        |    ELSE ord(substr(text, 2, 1)) & 63 END AS INT) AS height
        |FROM documents""".stripMargin),
  )

  private val partitioned = Q(
    "m_partitioned_media_pruning",
    (s, d) => {
      // the multimodal storage pattern at scale: opaque payloads in a
      // table PARTITIONED BY a metadata column; a metadata predicate
      // then prunes entire partitions before any payload byte is read
      val out = java.nio.file.Files
        .createTempDirectory("media_part").toString
      Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("text").cast("binary").as("payload"))
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .filter(col("lang") === "en") // partition-pruned scan
        .select(col("doc_id"), col("lang"), col("n_chars"))
    },
    Some(
      "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'"),
  )

  private val resize = Q(
    "m_resize_thumbnails",
    (s, d) => {
      val rs = org.apache.spark.sql.functions.udf(
        (b: Array[Byte]) => resizeStub(b, 8, 8))
      Tables(s, d).documents
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"), rs(col("payload")).as("thumb"))
        .select(col("doc_id"), octet_length(col("thumb")).as("thumb_bytes"),
          substring(base64(col("thumb")), 1, 12).as("thumb_prefix"))
    },
    // the stub's box-sampling is byte indexing (thumb[i] =
    // payload[i·len/64]); fixture text is ASCII (strlen == length for
    // every row), so char-based substr reproduces it byte-for-byte
    Some(
      """SELECT doc_id, CAST(64 AS INT) AS thumb_bytes,
        |  substr(to_base64(CAST(
        |    array_to_string(list_transform(range(0, 64), i ->
        |      substr(text, CAST(i * strlen(text) // 64 AS INT) + 1, 1)),
        |      '') AS BLOB)), 1, 12) AS thumb_prefix
        |FROM documents""".stripMargin),
  )

  private val frames = Q(
    "m_frame_sample",
    (s, d) =>
      sampleFrames(
        Tables(s, d).documents
          .select(col("doc_id"), col("text").cast("binary").as("payload")))
        .toDF()
        .select(col("doc_id"), col("frame_idx"),
          octet_length(col("frame")).as("frame_bytes")),
    // the SELECTION is pure arithmetic on the payload length (full
    // 64-byte frames, stride 4), so the mapPartitions batch shape is
    // checkable against an independent SQL derivation even though the
    // decode itself is a stub
    Some(
      """SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(64 AS INT) AS frame_bytes
        |FROM (SELECT doc_id,
        |        unnest(range(0, strlen(text) // 64, 4)) AS frame_idx
        |      FROM documents)""".stripMargin),
  )

  def all: Seq[Q] = Seq(meta, feats, dims, partitioned, resize, frames)
}
