package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/featurized per partition (ref vector/feature
  * handling: dqa/vector_utils.py:31).
  *
  * Image decode is REAL (JDK `javax.imageio`, PNG): the fixture corpus
  * is rendered from closed-form pixel formulas, so the DuckDB oracle
  * recomputes dims and pixel sums from the same formulas — fully
  * independent of the encoder, and the gate checks actual decoded
  * pixels. The batched `mapPartitions` shape (decoder init once per
  * partition, vectorised batches) is the Scala analog of `mapInPandas`
  * and is unchanged by swapping in a JNI/ONNX decoder for formats the
  * JDK lacks (JPEG2000, video codecs).
  */
object MultimodalQueries {

  // ---- deterministic PNG fixture corpus -------------------------------

  /** img i is (16+i)×(12+(7i)%9); pixel (x,y) has
    * RGB = ((3x+i)%256, (5y+i)%256, (x+y+i)%256). PNG is lossless, so a
    * real decode returns exactly these formulas — which is what lets the
    * oracle recompute features without ever seeing the encoded bytes.
    */
  val NumImages = 20
  def imgWidth(i: Int): Int = 16 + i
  def imgHeight(i: Int): Int = 12 + (7 * i) % 9

  def renderImage(i: Int): BufferedImage = {
    val (w, h) = (imgWidth(i), imgHeight(i))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (3 * x + i) % 256
        val g = (5 * y + i) % 256
        val b = (x + y + i) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode the corpus once into a content-keyed tmp dir (same pattern
    * as the s1/s6 fixtures): editing the formulas republished under a
    * new key instead of replaying a stale copy.
    */
  def pngFixtureDir(): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val layout = s"n=$NumImages;w=16+i;h=12+(7i)%9;px=3x+i,5y+i,x+y+i"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(layout.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val dir = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_png_fixture_$key")
    if (!Files.exists(dir)) {
      val stage = Files.createTempDirectory("graft_png_stage")
      (0 until NumImages).foreach { i =>
        ImageIO.write(renderImage(i), "png",
          stage.resolve(f"img_$i%03d.png").toFile)
      }
      try Files.move(stage, dir, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileSystemException =>
        // racing writer won with the same bytes
        (0 until NumImages).foreach(i =>
          Files.deleteIfExists(stage.resolve(f"img_$i%03d.png")))
        Files.deleteIfExists(stage)
      }
    }
    dir.toString
  }

  /** The fixture as a binary table: lazy-body object listing (S1 shape)
    * with the image id recovered from the object key.
    */
  def fixtureImages(s: SparkSession): DataFrame =
    s.read.format("binaryFile").load(s"${pngFixtureDir()}/*.png")
      .select(regexp_extract(col("path"), "img_(\\d+)\\.png$", 1)
        .cast("long").as("img_id"), col("content").as("payload"))

  // ---- real decoders --------------------------------------------------

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF). */
  def decodeImage(payload: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    img
  }

  case class ImageFeature(img_id: Long, width: Int, height: Int,
      px_sum: Long)

  /** Batching mirrors `mapInPandas` semantics: the decoder sees
    * fixed-size batches (one vectorised call per `BatchSize` payloads),
    * initialised once per partition.
    */
  val BatchSize = 32

  /** Decode each payload and extract (dims, Σ(r+g+b) over pixels). */
  def imageFeatures(images: DataFrame): Dataset[ImageFeature] = {
    val spark = images.sparkSession
    import spark.implicits._
    images
      .select(col("img_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point for a heavier decoder
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val img = decodeImage(bytes)
            val (w, h) = (img.getWidth, img.getHeight)
            var s = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                s += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            ImageFeature(id, w, h, s)
          }
        }
      }
  }

  /** REAL box-filter downsample to tw×th luminance bytes: pixel (x,y)
    * lands in cell (x·tw/w, y·th/h); the cell byte is the floor-average
    * of its pixels' luminance (r+g+b)/3. Integer-exact, so the oracle
    * replays it from the pixel formulas.
    */
  def boxResize(img: BufferedImage, tw: Int, th: Int): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = new Array[Long](tw * th)
    val cnt = new Array[Long](tw * th)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
          (rgb & 0xFF)) / 3
        val c = (y.toLong * th / h).toInt * tw + (x.toLong * tw / w).toInt
        sum(c) += lum
        cnt(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(tw * th)(c =>
      (if (cnt(c) == 0) 0L else sum(c) / cnt(c)).toByte)
  }

  // ---- binary checksum features (non-image payloads) ------------------

  case class BinaryFeature(doc_id: Long, n_bytes: Int, checksum: Long)

  /** Opaque-payload fingerprinting (FNV-1a), batched per partition —
    * the shape a payload-integrity / exact-dup pass over a media column
    * uses when the bytes are NOT decodable media.
    */
  def extractFeatures(docsWithPayload: DataFrame): Dataset[BinaryFeature] = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            var ck = 1469598103934665603L // FNV-1a offset basis
            bytes.foreach { b => ck ^= (b & 0xFFL); ck *= 1099511628211L }
            BinaryFeature(id, bytes.length, ck)
          }
        }
      }
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampler: every `stride`-th fixed-size chunk of a container
    * payload becomes a frame row — the generator (UDTF) shape: one input
    * row explodes into many typed frame rows, batched per partition.
    * (A real video codec slots in at the chunk-decode point; chunking
    * and striding are the Spark-side contract.)
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

  // ---- registered queries ---------------------------------------------

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
    // FNV-1a's 64-bit wrapping multiply replayed in DuckDB over the
    // payload's TRUE UTF-8 BYTES (via the shared hex-decoding fold in
    // OracleSql — byte-exact on any corpus, not just ASCII): checksum
    // carried as HUGEINT mod 2^64, xor on the BIGINT-safe low byte,
    // converted back to signed at the end.
    Some(
      s"""WITH RECURSIVE
         |items AS (SELECT doc_id, 0 AS i, text AS t FROM documents),
         |${graft.functions.OracleSql.fnvFold("items")}
         |SELECT d.doc_id,
         |  CAST(octet_length(encode(d.text)) AS INT) AS n_bytes,
         |  CAST(CASE WHEN CAST(o.h AS HUGEINT)
         |      >= CAST('9223372036854775808' AS HUGEINT)
         |    THEN CAST(o.h AS HUGEINT)
         |      - CAST('18446744073709551616' AS HUGEINT)
         |    ELSE CAST(o.h AS HUGEINT) END AS BIGINT) AS checksum
         |FROM done o JOIN documents d ON o.doc_id = d.doc_id""".stripMargin),
  )

  // real decode over the PNG fixture: the oracle recomputes dims and the
  // pixel sum from the generation formulas — it never sees PNG bytes, so
  // a green row means ImageIO actually decoded the pixels correctly
  private val dims = Q(
    "m_decode_dims",
    (s, _) => imageFeatures(fixtureImages(s)).toDF(),
    Some(
      s"""WITH imgs AS (
         |  SELECT i, 16 + i AS w, 12 + (i * 7) % 9 AS h
         |  FROM range(0, $NumImages) t(i))
         |SELECT CAST(i AS BIGINT) AS img_id, CAST(w AS INT) AS width,
         |  CAST(h AS INT) AS height,
         |  CAST(sum((x*3+i)%256 + (y*5+i)%256 + (x+y+i)%256) AS BIGINT)
         |    AS px_sum
         |FROM imgs, range(0, ${16 + NumImages}) rx(x), range(0, 21) ry(y)
         |WHERE x < w AND y < h
         |GROUP BY i, w, h""".stripMargin),
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

  /** Dynamic partition pruning — the join-driven sibling of the static
    * prune above: the fact is partitioned by `lang`, the predicate lives
    * on a DIM table (region = 'eu'), and Spark inserts a runtime
    * `dynamicpruning` subquery on the fact's partition column — at
    * 100 TB the fact directories for non-matching languages are never
    * even listed. Both sides are file sources (a LocalRelation dim
    * would constant-fold into a static filter and prove nothing); the
    * plan guard asserts the dynamicpruning expression is present.
    */
  private val dpp = Q(
    "s19_dynamic_partition_pruning",
    (s, d) => {
      val out = java.nio.file.Files
        .createTempDirectory("dpp_fact").toString
      Tables(s, d).documents
        .select(col("doc_id"), col("n_chars"), col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      val dimDir = java.nio.file.Files
        .createTempDirectory("dpp_dim").toString
      import s.implicits._
      Seq(("en", "na"), ("es", "na"), ("fr", "eu"), ("de", "eu"),
        ("zh", "apac"))
        .toDF("lang", "region")
        .write.mode("overwrite").parquet(dimDir)
      val fact = s.read.parquet(out)
      val dim = s.read.parquet(dimDir).filter(col("region") === "eu")
      fact.join(dim, "lang")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
    },
    Some(
      """SELECT lang, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE lang IN ('fr', 'de')
        |GROUP BY 1""".stripMargin),
  )

  private val resize = Q(
    "m_resize_thumbnails",
    (s, _) => {
      val spark = s
      import spark.implicits._
      fixtureImages(s)
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
            val t = boxResize(decodeImage(bytes), 8, 8)
            (id, t.length, t.foldLeft(0L)((a, b) => a + (b & 0xFF)))
          })
        }
        .toDF("img_id", "thumb_bytes", "thumb_sum")
    },
    // the box filter is integer-exact, so the oracle rebuilds every
    // 8×8 cell average from the pixel formulas and sums the thumbnail
    Some(
      s"""WITH imgs AS (
         |  SELECT i, 16 + i AS w, 12 + (i * 7) % 9 AS h
         |  FROM range(0, $NumImages) t(i)),
         |px AS (
         |  SELECT i, x*8//w AS tx, y*8//h AS ty,
         |    ((x*3+i)%256 + (y*5+i)%256 + (x+y+i)%256)//3 AS lum
         |  FROM imgs, range(0, ${16 + NumImages}) rx(x), range(0, 21) ry(y)
         |  WHERE x < w AND y < h),
         |cells AS (
         |  SELECT i, tx, ty, sum(lum)//count(*) AS avg
         |  FROM px GROUP BY i, tx, ty)
         |SELECT CAST(i AS BIGINT) AS img_id, CAST(64 AS INT) AS thumb_bytes,
         |  CAST(sum(avg) AS BIGINT) AS thumb_sum
         |FROM cells GROUP BY i""".stripMargin),
  )

  // ---- perceptual hashing (image near-dup) ----------------------------

  case class ImageDHash(img_id: Long, dhash_hi: Long, dhash_lo: Long)

  /** dHash perceptual fingerprint: box-resize to a 9×8 luminance grid,
    * then one bit per adjacent-cell comparison (right > left) — 64 bits
    * emitted as two 32-bit halves so every SQL engine replays them
    * without signed-shift edge cases. Near-duplicate IMAGES (re-encoded,
    * slightly rescaled) keep ~identical dHashes while any byte-level
    * hash scatters — this is the image analog of SimHash for text, and
    * the front half of an image-dedup pass over a multimodal corpus.
    * All arithmetic is integer (the box filter is floor-average), so
    * the hash is decoder-exact and the oracle recomputes it from the
    * fixture pixel formulas.
    */
  def imageDHash(images: DataFrame): Dataset[ImageDHash] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("img_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
          val g = boxResize(decodeImage(bytes), 9, 8)
          var h = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if ((g(y * 9 + x + 1) & 0xFF) > (g(y * 9 + x) & 0xFF))
                h |= 1L << (y * 8 + x)
              x += 1
            }
            y += 1
          }
          ImageDHash(id, h >>> 32, h & 0xFFFFFFFFL)
        })
      }
  }

  /** Shared oracle CTEs: dh(img_id, dhash_hi, dhash_lo) recomputed from
    * the closed-form pixel formulas (9×8 grid, floor-average cells).
    */
  private def dhashOracleCtes: String =
    s"""imgs AS (
       |  SELECT i, 16 + i AS w, 12 + (i * 7) % 9 AS h
       |  FROM range(0, $NumImages) t(i)),
       |px AS (
       |  SELECT i, x*9//w AS cx, y*8//h AS cy,
       |    ((x*3+i)%256 + (y*5+i)%256 + (x+y+i)%256)//3 AS lum
       |  FROM imgs, range(0, ${16 + NumImages}) rx(x), range(0, 21) ry(y)
       |  WHERE x < w AND y < h),
       |cells AS (
       |  SELECT i, cx, cy, sum(lum)//count(*) AS v
       |  FROM px GROUP BY i, cx, cy),
       |bits AS (
       |  SELECT a.i, a.cy, a.cx,
       |    CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
       |  FROM cells a JOIN cells b
       |    ON a.i = b.i AND a.cy = b.cy AND b.cx = a.cx + 1
       |  WHERE a.cx < 8),
       |dh AS (
       |  SELECT CAST(i AS BIGINT) AS img_id,
       |    CAST(sum(CASE WHEN cy >= 4
       |      THEN bit * (1::BIGINT << (cy*8 + cx - 32)) ELSE 0 END)
       |      AS BIGINT) AS dhash_hi,
       |    CAST(sum(CASE WHEN cy < 4
       |      THEN bit * (1::BIGINT << (cy*8 + cx)) ELSE 0 END)
       |      AS BIGINT) AS dhash_lo
       |  FROM bits GROUP BY i)""".stripMargin

  private val dhash = Q(
    "m_image_dhash",
    (s, _) => imageDHash(fixtureImages(s)).toDF(),
    Some(
      s"""WITH $dhashOracleCtes
         |SELECT img_id, dhash_hi, dhash_lo FROM dh""".stripMargin),
  )

  /** Hamming threshold for "same image, different encode". */
  val DHashMaxHamming = 12

  private val dhashPairs = Q(
    "m_image_dhash_pairs",
    (s, _) => {
      // SimHash-style LSH banding over the 64-bit fingerprint: 4 bands
      // of 16 bits; candidate pairs share ≥1 exact band (equi-shuffle on
      // (band, value) — never all-pairs), then the exact Hamming check.
      // Banded semantics are part of the contract (a ≤12-bit difference
      // spread 4+4+4+4 over the bands escapes; the oracle states the
      // same condition).
      val dh = imageDHash(fixtureImages(s)).toDF()
      val bands = dh.select(col("img_id"), col("dhash_hi"), col("dhash_lo"),
        explode(array((0 until 4).map { bi =>
          val src = if (bi < 2) col("dhash_lo") else col("dhash_hi")
          val sh = (bi % 2) * 16
          struct(lit(bi).as("bi"),
            shiftrightunsigned(src, sh).bitwiseAND(lit(0xFFFFL)).as("bv"))
        }: _*)).as("b"))
        .select(col("img_id"), col("dhash_hi"), col("dhash_lo"),
          col("b.bi").as("bi"), col("b.bv").as("bv"))
      val x = bands.alias("x")
      val y = bands.alias("y")
      val ham = (bit_count(col("x.dhash_hi").bitwiseXOR(col("y.dhash_hi"))) +
        bit_count(col("x.dhash_lo").bitwiseXOR(col("y.dhash_lo"))))
        .cast("int")
      x.join(y, col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
          col("x.img_id") < col("y.img_id"))
        .select(col("x.img_id").as("img_a"), col("y.img_id").as("img_b"),
          ham.as("hamming"))
        .distinct()
        .filter(col("hamming") <= DHashMaxHamming)
    },
    Some(
      s"""WITH $dhashOracleCtes,
         |bands AS (
         |  SELECT img_id, dhash_hi, dhash_lo, b.bi,
         |    CASE b.bi WHEN 0 THEN dhash_lo % 65536
         |              WHEN 1 THEN (dhash_lo // 65536) % 65536
         |              WHEN 2 THEN dhash_hi % 65536
         |              ELSE (dhash_hi // 65536) % 65536 END AS bv
         |  FROM dh, (SELECT unnest([0,1,2,3]) AS bi) b),
         |pairs AS (
         |  SELECT DISTINCT x.img_id AS img_a, y.img_id AS img_b,
         |    x.dhash_hi AS xh, x.dhash_lo AS xl,
         |    y.dhash_hi AS yh, y.dhash_lo AS yl
         |  FROM bands x JOIN bands y
         |    ON x.bi = y.bi AND x.bv = y.bv AND x.img_id < y.img_id)
         |SELECT img_a, img_b,
         |  CAST(bit_count(xor(xh, yh)) + bit_count(xor(xl, yl)) AS INT)
         |    AS hamming
         |FROM pairs
         |WHERE bit_count(xor(xh, yh)) + bit_count(xor(xl, yl))
         |  <= $DHashMaxHamming""".stripMargin),
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
    // checkable against an independent SQL derivation
    Some(
      """SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(64 AS INT) AS frame_bytes
        |FROM (SELECT doc_id,
        |        unnest(range(0, strlen(text) // 64, 4)) AS frame_idx
        |      FROM documents)""".stripMargin),
  )

  // ---- audio: real WAV codec + windowed energy ------------------------

  /** Deterministic PCM fixture: clip i holds 400·(10+i) signed 8-bit
    * samples; sample j = ((j·(i+3)) mod 256) − 128, except every third
    * 400-sample window (rotating with i) is zeroed — so silence
    * detection has real positives. Encoded as REAL WAV files through
    * `javax.sound.sampled` (the JDK's audio codec), decoded back through
    * the same API in the operator — the oracle recomputes energies from
    * the closed-form samples, independent of the container bytes.
    */
  val NumClips = 12
  val WindowSamples = 400
  def clipWindows(i: Int): Int = 10 + i

  def clipSamples(i: Int): Array[Byte] = {
    val n = WindowSamples * clipWindows(i)
    Array.tabulate(n) { j =>
      if ((j / WindowSamples) % 3 == i % 3) 0.toByte
      else (((j.toLong * (i + 3)) % 256) - 128).toByte
    }
  }

  def wavFixtureDir(): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val layout = s"n=$NumClips;w=$WindowSamples;nw=10+i;s=(j(i+3))%256-128;mute=(j/w)%3==i%3"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(layout.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val dir = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_wav_fixture_$key")
    if (!Files.exists(dir)) {
      val stage = Files.createTempDirectory("graft_wav_stage")
      val fmt = new AudioFormat(8000f, 8, 1, true, false)
      (0 until NumClips).foreach { i =>
        val pcm = clipSamples(i)
        val ais = new AudioInputStream(
          new ByteArrayInputStream(pcm), fmt, pcm.length)
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE,
          stage.resolve(f"clip_$i%03d.wav").toFile)
      }
      try Files.move(stage, dir, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileSystemException =>
        (0 until NumClips).foreach(i =>
          Files.deleteIfExists(stage.resolve(f"clip_$i%03d.wav")))
        Files.deleteIfExists(stage)
      }
    }
    dir.toString
  }

  def fixtureClips(s: SparkSession): DataFrame =
    s.read.format("binaryFile").load(s"${wavFixtureDir()}/*.wav")
      .select(regexp_extract(col("path"), "clip_(\\d+)\\.wav$", 1)
        .cast("long").as("clip_id"), col("content").as("payload"))

  case class AudioWindow(clip_id: Long, window_id: Int, energy: Long,
      is_silence: Boolean)

  /** REAL WAV decode → per-window Σ sample² (integer-exact energy) and
    * a silence flag. Decoder init per partition, windows streamed — the
    * state a VAD/segmentation pass needs, never more than one window.
    */
  def audioEnergyWindows(clips: DataFrame): Dataset[AudioWindow] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select(col("clip_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(bytes))
          // 8-bit WAV is UNSIGNED by spec — AudioSystem.write converts
          // signed input on encode, so honour the container's declared
          // encoding on the way back out (the real decoder contract)
          val signed = ais.getFormat.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          // stream one window at a time — NEVER readAllBytes: a long
          // recording would otherwise hold the whole PCM payload per
          // row; peak memory here is one WindowSamples buffer
          val buf = new Array[Byte](WindowSamples)
          Iterator.from(0).map { wi =>
            var got = 0
            var r = 0
            while (got < WindowSamples && r >= 0) {
              r = ais.read(buf, got, WindowSamples - got)
              if (r > 0) got += r
            }
            (wi, got)
          }.takeWhile(_._2 > 0).map { case (wi, got) =>
            var e = 0L
            var i = 0
            while (i < got) {
              val v: Long =
                if (signed) buf(i).toLong else (buf(i) & 0xFF) - 128L
              e += v * v
              i += 1
            }
            AudioWindow(id, wi, e, e < 1000L)
          }
        }
      }
  }

  private val audio = Q(
    "m_audio_energy_windows",
    (s, d) => audioEnergyWindows(fixtureClips(s)).toDF(),
    // closed-form replay: same sample formula, same zeroed windows
    Some(
      s"""WITH clips AS (SELECT unnest(range($NumClips)) AS i),
         |wins AS (
         |  SELECT i, unnest(range(10 + i)) AS w FROM clips),
         |energy AS (
         |  SELECT i, w,
         |    CASE WHEN w % 3 = i % 3 THEN 0
         |    ELSE (
         |      SELECT CAST(sum(
         |        ((((w * $WindowSamples + k) * (i + 3)) % 256) - 128)
         |        * ((((w * $WindowSamples + k) * (i + 3)) % 256) - 128)
         |      ) AS BIGINT)
         |      FROM (SELECT unnest(range($WindowSamples)) AS k))
         |    END AS energy
         |  FROM wins)
         |SELECT i AS clip_id, CAST(w AS INT) AS window_id, energy,
         |  energy < 1000 AS is_silence
         |FROM energy""".stripMargin),
  )

  /** Voice-activity segments: contiguous runs of non-silent windows per
    * clip (the VAD segmentation every speech pipeline runs before
    * transcription). Islands by the gaps-and-islands trick — window_id
    * minus its per-clip dense rank among non-silent windows is constant
    * within a run — so segmentation is one per-clip window function over
    * the (already tiny) energy frame, never the samples.
    */
  private val vad = Q(
    "m_audio_vad_segments",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("clip_id").orderBy("window_id")
      audioEnergyWindows(fixtureClips(s)).toDF()
        .filter(!col("is_silence"))
        .withColumn("isl", col("window_id") - row_number().over(w))
        .groupBy("clip_id", "isl")
        .agg(min("window_id").as("seg_start"),
          count(lit(1)).cast("long").as("n_windows"),
          sum("energy").as("total_energy"))
        .select("clip_id", "seg_start", "n_windows", "total_energy")
    },
    Some(
      s"""WITH clips AS (SELECT unnest(range($NumClips)) AS i),
         |wins AS (
         |  SELECT i, unnest(range(10 + i)) AS w FROM clips),
         |energy AS (
         |  SELECT i, w,
         |    CASE WHEN w % 3 = i % 3 THEN 0
         |    ELSE (
         |      SELECT CAST(sum(
         |        ((((w * $WindowSamples + k) * (i + 3)) % 256) - 128)
         |        * ((((w * $WindowSamples + k) * (i + 3)) % 256) - 128)
         |      ) AS BIGINT)
         |      FROM (SELECT unnest(range($WindowSamples)) AS k))
         |    END AS energy
         |  FROM wins),
         |nonsilent AS (
         |  SELECT i, w, energy,
         |    w - row_number() OVER (PARTITION BY i ORDER BY w) AS isl
         |  FROM energy WHERE energy >= 1000)
         |SELECT i AS clip_id, CAST(min(w) AS INT) AS seg_start,
         |  CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(sum(energy) AS BIGINT) AS total_energy
         |FROM nonsilent GROUP BY i, isl""".stripMargin),
  )

  /** Scene segmentation (shot-boundary detection) over the sampled frame
    * stream: per frame an 8-bucket byte-profile signature, L1 distance
    * to the previous sampled frame, boundary where the distance exceeds
    * [[SceneCutThreshold]], scenes as the running boundary count — the
    * standard video-curation step before per-scene frame dedup (one
    * exemplar frame per shot instead of every frame of a static shot).
    *
    * The signature is computed from the SAME byte windows
    * [[sampleFrames]] extracts (the fixture's "video" payload is the
    * document text, so byte b of frame f is `ascii(substr(text,
    * f·64+b+1, 1))` — ASCII corpus, chars ≡ bytes), which keeps the
    * whole lag-window segmentation SQL-replayable. Scale: signatures are
    * a pure map in the scan, the lag/sum windows partition by doc — no
    * global ordering, no driver state, segments stream out per document.
    */
  val SceneCutThreshold = 600

  private val scenes = Q(
    "m_scene_segments",
    (s, d) => {
      val frames = sampleFrames(
        Tables(s, d).documents
          .select(col("doc_id"), col("text").cast("binary").as("payload")))
        .toDF().select(col("doc_id"), col("frame_idx"))
      val sig = frames
        .join(Tables(s, d).documents.select(col("doc_id"), col("text")),
          "doc_id")
        .select(col("doc_id"), col("frame_idx"), expr(
          """transform(sequence(0, 7), b ->
            |  aggregate(sequence(1, 8), CAST(0 AS BIGINT), (acc, j) ->
            |    acc + ascii(substring(text,
            |      CAST(frame_idx * 64 + b * 8 + j AS INT), 1))))"""
            .stripMargin).as("sig"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("frame_idx")
      val withPrev = sig.withColumn("prev", lag(col("sig"), 1).over(w))
      val dist = expr(
        """aggregate(zip_with(sig, prev, (x, y) -> abs(x - y)),
          |  CAST(0 AS BIGINT), (a, v) -> a + v)""".stripMargin)
      val cut = withPrev.withColumn("boundary",
        when(col("prev").isNull ||
          dist > SceneCutThreshold, 1L).otherwise(0L))
      cut.withColumn("scene_id", sum(col("boundary")).over(w))
        .groupBy("doc_id", "scene_id")
        .agg(count(lit(1)).as("n_frames"),
          min(col("frame_idx")).cast("int").as("start_idx"),
          max(col("frame_idx")).cast("int").as("end_idx"))
    },
    Some(
      s"""WITH fr AS (
         |  SELECT doc_id, text,
         |    unnest(range(0, strlen(text) // 64, 4)) AS frame_idx
         |  FROM documents),
         |sig AS (
         |  SELECT doc_id, frame_idx,
         |    list_transform(range(0, 8), b ->
         |      list_sum(list_transform(range(1, 9), j ->
         |        ascii(substr(text,
         |          CAST(frame_idx * 64 + b * 8 + j AS INT), 1))))) AS sg
         |  FROM fr),
         |lagged AS (
         |  SELECT doc_id, frame_idx, sg,
         |    lag(sg) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
         |  FROM sig),
         |cut AS (
         |  SELECT doc_id, frame_idx,
         |    CASE WHEN prev IS NULL OR
         |      list_sum(list_transform(range(1, 9), i ->
         |        abs(sg[i] - prev[i]))) > $SceneCutThreshold
         |    THEN 1 ELSE 0 END AS boundary
         |  FROM lagged),
         |scenes AS (
         |  SELECT doc_id, frame_idx,
         |    sum(boundary) OVER (PARTITION BY doc_id ORDER BY frame_idx)
         |      AS scene_id
         |  FROM cut)
         |SELECT doc_id, CAST(scene_id AS BIGINT) AS scene_id,
         |  count(*) AS n_frames,
         |  CAST(min(frame_idx) AS INT) AS start_idx,
         |  CAST(max(frame_idx) AS INT) AS end_idx
         |FROM scenes GROUP BY 1, 2""".stripMargin),
  )

  def all: Seq[Q] =
    Seq(meta, feats, dims, partitioned, dpp, resize, frames, audio, vad,
      dhash, dhashPairs, scenes)
}
