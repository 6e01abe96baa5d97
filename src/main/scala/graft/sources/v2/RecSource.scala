package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.util

/** A full DataSource V2 connector for the `graftrec` fixed-width binary
  * record format — the engine's custom-connector surface (every other
  * source rides a built-in format; the xlsx reader is a driver-side
  * dim parse). Demonstrates the three contracts a 100 TB source must
  * honour, each visible in `.explain`:
  *
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *    decode only requested fields from each 24-byte record;
  *  - **filter pushdown with exact seek** (`SupportsPushDownFilters`):
  *    records are clustered dense on `id` (writer contract), so an id
  *    range predicate converts to a BYTE OFFSET — the scan reads
  *    exactly the matching slice, the connector analog of parquet
  *    row-group pruning with a perfect index;
  *  - **split planning** (`Batch.planInputPartitions`): the surviving
  *    row range splits into [[RecSource.TargetSplits]] independent
  *    slices, each read by one task with its own channel.
  *
  * File layout: 8-byte magic "GRAFTREC", row count (LE long), min id
  * (LE long), then rows of (id: long, value: long, tag: 8 ASCII bytes)
  * — 24 bytes each, ids dense ascending from min id.
  */
class RecSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RecSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RecTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object RecSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  val Magic = "GRAFTREC"
  val HeaderBytes = 24
  val RecordBytes = 24
  val TargetSplits = 8

  /** Deterministic value/tag derivation the writer uses — shared with
    * the oracle, which replays it arithmetically.
    */
  def valueOf(id: Long): Long = (id * 48271L) % 999983L
  def tagOf(id: Long): String = f"t${id % 100}%03d"

  /** Write n dense records with ids [minId, minId + n). */
  def write(path: String, minId: Long, n: Long): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f), 1 << 16)
    val buf = ByteBuffer.allocate(RecordBytes).order(ByteOrder.LITTLE_ENDIAN)
    val header = ByteBuffer.allocate(HeaderBytes).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Magic.getBytes("US-ASCII")).putLong(n).putLong(minId)
    out.write(header.array())
    var i = 0L
    while (i < n) {
      val id = minId + i
      buf.clear()
      buf.putLong(id).putLong(valueOf(id))
      val tag = tagOf(id).getBytes("US-ASCII")
      buf.put(tag)
      // tag is exactly 4 chars by construction ("t" + 3 digits); pad
      // the fixed 8-byte field with spaces
      var p = tag.length
      while (p < 8) { buf.put(' '.toByte); p += 1 }
      out.write(buf.array())
      i += 1
    }
    out.close()
  }

  private[v2] def readHeader(path: String): (Long, Long) = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val h = new Array[Byte](HeaderBytes)
      raf.readFully(h)
      val bb = ByteBuffer.wrap(h).order(ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](8); bb.get(magic)
      require(new String(magic, "US-ASCII") == Magic, s"not a graftrec: $path")
      (bb.getLong, bb.getLong) // (n, minId)
    } finally raf.close()
  }
}

private class RecTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graftrec:$path"
  override def schema(): StructType = RecSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RecScanBuilder(path)
}

private class RecScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = RecSource.Schema
  private var lo = Long.MinValue
  private var hi = Long.MaxValue
  private var pushed = Array.empty[Filter]

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("id", v) =>
        lo = math.max(lo, num(v)); hi = math.min(hi, num(v))
      case GreaterThan("id", v) => lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual("id", v) => lo = math.max(lo, num(v))
      case LessThan("id", v) => hi = math.min(hi, num(v) - 1)
      case LessThanOrEqual("id", v) => hi = math.min(hi, num(v))
      case _ =>
    }
    pushed = accepted
    // accepted bounds are EXACT on the clustered id — nothing to
    // re-evaluate above the scan
    rejected
  }
  private def num(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new RecScan(path, required, lo, hi, pushed)
}

private class RecScan(path: String, required: StructType,
    lo: Long, hi: Long, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftrec $path bounds=[$lo,$hi] cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val (n, minId) = RecSource.readHeader(path)
    // clip the pushed id range to the file's dense id span, then
    // convert to ROW indices — the pushdown IS the seek
    val fromId = math.max(lo, minId)
    val toId = math.min(hi, minId + n - 1)
    if (fromId > toId) return Array.empty
    val fromRow = fromId - minId
    val toRow = toId - minId
    val total = toRow - fromRow + 1
    val splits = math.min(RecSource.TargetSplits.toLong, total).toInt
    (0 until splits).map { s =>
      val a = fromRow + s * total / splits
      val b = fromRow + (s + 1) * total / splits - 1
      RecPartition(path, a, b, minId): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RecReaderFactory(required)
}

private case class RecPartition(path: String, fromRow: Long, toRow: Long,
    minId: Long) extends InputPartition

private class RecReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RecReader(p.asInstanceOf[RecPartition], required)
}

private class RecReader(p: RecPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val raf = new RandomAccessFile(p.path, "r")
  raf.seek(RecSource.HeaderBytes + p.fromRow * RecSource.RecordBytes)
  private val in = new java.io.BufferedInputStream(
    new java.io.FileInputStream(raf.getFD), 1 << 16)
  private var row = p.fromRow
  private val rec = new Array[Byte](RecSource.RecordBytes)
  private val cols = required.fieldNames
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (row > p.toRow) return false
    var off = 0
    while (off < rec.length) {
      val k = in.read(rec, off, rec.length - off)
      require(k >= 0, "truncated graftrec file")
      off += k
    }
    val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
    val id = bb.getLong(0)
    val vals: Array[Any] = cols.map {
      case "id" => id
      case "value" => bb.getLong(8)
      case "tag" =>
        UTF8String.fromString(
          new String(rec, 16, 8, "US-ASCII").trim)
    }
    current = InternalRow.fromSeq(vals.toIndexedSeq)
    row += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = { in.close(); raf.close() }
}

/** Registered query: scan the graftrec file through the V2 connector
  * with an id-range predicate and full projection — the pushdown
  * converts the predicate to a byte seek (RecScan.description shows
  * the bounds; RecSourceSpec pins both pruning and pushdown on the
  * planned scan). The fixture file derives every byte arithmetically
  * from the part table's size, which is exactly what the oracle
  * replays.
  */
object RecV2Query {
  import graft.{Q, Tables}
  import org.apache.spark.sql.functions._

  val MinId = 1000L
  val PerPart = 20L

  def fixture(s: org.apache.spark.sql.SparkSession, d: String): (String, Long) = {
    val n = Tables(s, d).part.count() * PerPart
    val path = s"target/recv2/rec_$n.rec"
    RecSource.synchronized {
      if (!new java.io.File(path).exists()) RecSource.write(path, MinId, n)
    }
    (path, n)
  }

  private val q = Q(
    "s32_dsv2_pushdown_scan",
    (s, d) => {
      val (path, n) = fixture(s, d)
      s.read.format(classOf[RecSource].getName).load(path)
        .filter(col("id") >= MinId + n / 4 && col("id") <= MinId + n / 2)
    },
    Some(
      s"""WITH ids AS (
         |  SELECT $MinId + (p_partkey - 1) * $PerPart + j.j AS id
         |  FROM part
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${PerPart - 1}))
         |              AS j) j),
         |n AS (SELECT count(*) AS n FROM ids)
         |SELECT id, (id * 48271) % 999983 AS value,
         |  't' || lpad(CAST(id % 100 AS VARCHAR), 3, '0') AS tag
         |FROM ids CROSS JOIN n
         |WHERE id >= $MinId + n.n // 4
         |  AND id <= $MinId + n.n // 2""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
