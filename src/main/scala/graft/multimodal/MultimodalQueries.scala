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

  /** Binary payloads → per-partition batched feature extraction. */
  def extractFeatures(docsWithPayload: DataFrame): Dataset[MediaFeature] = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point for a real decoder
        it.map { case (id, bytes) =>
          val (w, h, ck) = decodeStub(bytes)
          MediaFeature(id, bytes.length, w, h, ck)
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
    None, // stubbed decoder — plumbing verified in MultimodalSpec
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

  def all: Seq[Q] = Seq(meta, feats, partitioned)
}
