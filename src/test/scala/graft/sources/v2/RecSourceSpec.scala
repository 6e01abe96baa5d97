package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class RecSourceSpec extends SparkSpec {

  private def file(n: Long): String = {
    val path = java.nio.file.Files.createTempDirectory("rec").toString +
      "/t.rec"
    RecSource.writeDense(path, 1000L, n)
    path
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get

  test("reads back exactly what the writer derived") {
    val df = spark.read.format(classOf[RecSource].getName).load(file(50))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 50)
    assert(rows.head == ((1000L, RecSource.valueOf(1000L), "t000")))
    assert(rows.forall { case (id, v, t) =>
      v == RecSource.valueOf(id) && t == RecSource.tagOf(id) })
  }

  test("id range predicate pushes into the scan as a byte seek") {
    val df = spark.read.format(classOf[RecSource].getName).load(file(1000))
      .filter(col("id") >= 1200 && col("id") < 1300)
    // sorted-but-not-dense still seeks correctly via the binary search
    val scan = scanOf(df)
    assert(scan.description().contains("bounds=[1200,1299]"))
    // the pruned range splits across partitions; total rows = range
    assert(df.count() == 100)
    assert(df.rdd.getNumPartitions <= RecSource.TargetSplits)
    // empty range plans zero partitions
    val none = spark.read.format(classOf[RecSource].getName)
      .load(file(10)).filter(col("id") > 99999)
    assert(none.count() == 0)
  }

  test("column pruning reaches the reader schema") {
    val df = spark.read.format(classOf[RecSource].getName).load(file(10))
      .select(col("value"))
    val scan = scanOf(df)
    assert(scan.readSchema().fieldNames.toSeq == Seq("value"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      (1000L until 1010L).map(RecSource.valueOf))
  }

  test("multi-file tables prune whole files on header ranges") {
    val dir = java.nio.file.Files.createTempDirectory("recdir").toString
    RecSource.writeDense(s"$dir/a.rec", 0L, 100)     // ids [0, 100)
    RecSource.writeDense(s"$dir/b.rec", 5000L, 100)  // ids [5000, 5100)
    val df = spark.read.format(classOf[RecSource].getName).load(dir)
      .filter(col("id") >= 5010 && col("id") <= 5019)
    assert(df.count() == 10)
    val parts = df.rdd.partitions.length
    assert(parts <= RecSource.TargetSplits) // file a contributed nothing
    val all = spark.read.format(classOf[RecSource].getName).load(dir)
    assert(all.count() == 200)
  }

  test("write path: staged files appear only after the driver commit") {
    val dir = java.nio.file.Files.createTempDirectory("recw").toString + "/t"
    import spark.implicits._
    val src = (1L to 500L).map(i =>
      (i, RecSource.valueOf(i), RecSource.tagOf(i))).toDF("id", "value", "tag")
      .repartition(4)
    src.write.format(classOf[RecSource].getName).mode("append").save(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.forall(!_.endsWith(".staged")))
    assert(files.count(_.endsWith(".rec")) == 4)  // one per task
    val back = spark.read.format(classOf[RecSource].getName).load(dir)
    assert(back.count() == 500)
    // pushdown works across the committed multi-file table
    assert(back.filter(col("id") === 123L).collect()
      .map(r => (r.getLong(1), r.getString(2))).toSeq ==
      Seq((RecSource.valueOf(123L), RecSource.tagOf(123L))))
  }

  test("overwrite mode truncates the previous generation atomically") {
    val dir = java.nio.file.Files.createTempDirectory("recw").toString + "/t"
    import spark.implicits._
    def gen(lo: Long, hi: Long) = (lo to hi).map(i =>
      (i, RecSource.valueOf(i), RecSource.tagOf(i))).toDF("id", "value", "tag")
    gen(1L, 300L).repartition(3)
      .write.format(classOf[RecSource].getName).mode("append").save(dir)
    // the advertised TRUNCATE capability must actually resolve: overwrite
    // replaces, not unions with, the previous files
    gen(1000L, 1099L).repartition(2)
      .write.format(classOf[RecSource].getName).mode("overwrite").save(dir)
    val back = spark.read.format(classOf[RecSource].getName).load(dir)
    assert(back.count() == 100)
    assert(back.agg(min(col("id")), max(col("id"))).collect().head
      .toSeq == Seq(1000L, 1099L))
    // generation layout: the two new files live under the gen dir the
    // CURRENT manifest names; the pre-truncate flat files were GC'd
    // after the publish, so nothing stray remains at top level
    val top = new java.io.File(dir)
    assert(new java.io.File(top, RecSource.CurrentMarker).isFile)
    assert(top.listFiles().count(_.getName.endsWith(".rec")) == 0)
    assert(RecSource.listFiles(dir).size == 2)
    // a second overwrite swaps generations and GCs the first one
    gen(5L, 9L).repartition(1)
      .write.format(classOf[RecSource].getName).mode("overwrite").save(dir)
    assert(spark.read.format(classOf[RecSource].getName).load(dir)
      .count() == 5)
    assert(top.listFiles().count(_.getName.startsWith("gen-")) == 1)
  }

  test("an unpublished generation is invisible: crash-safe truncate") {
    val dir = java.nio.file.Files.createTempDirectory("recw").toString + "/t"
    import spark.implicits._
    (1L to 50L).map(i => (i, RecSource.valueOf(i), RecSource.tagOf(i)))
      .toDF("id", "value", "tag").repartition(1)
      .write.format(classOf[RecSource].getName).mode("overwrite").save(dir)
    // simulate a truncate job that died AFTER renaming its files into a
    // fresh generation but BEFORE the atomic manifest move: the old
    // table must read back complete — the pre-manifest layout (delete
    // old, then rename new in) would have read EMPTY here
    val stray = new java.io.File(dir, "gen-deadbeef")
    assert(stray.mkdirs())
    RecSource.writeDense(new java.io.File(stray, "part-x.rec").getPath,
      9000L, 7L)
    val back = spark.read.format(classOf[RecSource].getName).load(dir)
    assert(back.count() == 50)
    assert(back.agg(max(col("id"))).collect().head.getLong(0) == 50L)
  }

  test("the scan plans COLUMNAR: ColumnarToRow sits above BatchScan") {
    val df = spark.read.format(classOf[RecSource].getName).load(file(100))
      .filter(col("id") < 1050)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"))
    assert(df.count() == 50)
    // vectorized string decode trims the fixed-width padding
    assert(df.select("tag").collect().map(_.getString(0))
      .forall(t => t.length == 4 && t.startsWith("t")))
  }

  test("tag equality skips whole files via the header bloom") {
    val dir = java.nio.file.Files.createTempDirectory("recb").toString
    // two files with DISJOINT tag sets: ids [0,100) tags t000..t099;
    // ids [5000,5100) tags t000..t099 too — same tags! use custom rows
    RecSource.writeFile(s"$dir/a.rec",
      (1L to 50L).iterator.map(i => (i, i, "aaa")))
    RecSource.writeFile(s"$dir/b.rec",
      (100L to 150L).iterator.map(i => (i, i, "bbb")))
    val df = spark.read.format(classOf[RecSource].getName).load(dir)
      .filter(col("tag") === "bbb")
    // file a's bloom cannot contain "bbb" (deterministic hashing, and
    // the spec would catch a false positive as an extra partition)
    assert(df.rdd.getNumPartitions <= RecSource.TargetSplits)
    assert(df.count() == 51)
    assert(df.agg(org.apache.spark.sql.functions.min("id")).head()
      .getLong(0) == 100L)
    // the residual filter still evaluates: a bloom false positive can
    // never leak rows
    assert(spark.read.format(classOf[RecSource].getName).load(dir)
      .filter(col("tag") === "zzz").count() == 0)
  }

  test("an unsupported predicate stays above the scan, others push") {
    val df = spark.read.format(classOf[RecSource].getName).load(file(200))
      .filter(col("id") >= 1050 && col("tag") === "t051")
    val scan = scanOf(df)
    assert(scan.description().contains("bounds=[1050,"))
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1051L, 1151L))
  }

  // with an aggregate the physical scan hides under AdaptiveSparkPlanExec
  // until execution — read the scan off the optimized logical plan
  private def logicalScanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation => r.scan
    }.get

  test("count/min/max push to the header: no record bytes read") {
    val df = spark.read.format(classOf[RecSource].getName).load(file(500))
      .agg(count(lit(1)), min(col("id")), max(col("id")))
    assert(logicalScanOf(df).description().contains("AGG-PUSHED"),
      "unfiltered count/min/max must come from the 32-byte header")
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((500L, 1000L, 1499L)))
  }

  test("agg pushdown merges per-file partials across a multi-file table") {
    val dir = java.nio.file.Files.createTempDirectory("recagg").toString
    RecSource.writeDense(s"$dir/a.rec", 0L, 100L)
    RecSource.writeDense(s"$dir/b.rec", 5000L, 50L)
    val df = spark.read.format(classOf[RecSource].getName).load(dir)
      .agg(count(lit(1)), min(col("id")), max(col("id")))
    assert(logicalScanOf(df).description().contains("AGG-PUSHED"))
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((150L, 0L, 5049L)))
  }

  test("ORDER BY id LIMIT pushes as a byte seek, both directions") {
    val p = file(1000)
    val asc = spark.read.format(classOf[RecSource].getName).load(p)
      .orderBy(col("id")).limit(3)
    assert(logicalScanOf(asc).description().contains("take_first=3"))
    assert(asc.collect().map(_.getLong(0)).toSeq == Seq(1000L, 1001L, 1002L))
    val desc = spark.read.format(classOf[RecSource].getName).load(p)
      .orderBy(col("id").desc).limit(3)
    assert(logicalScanOf(desc).description().contains("take_last=3"))
    assert(desc.collect().map(_.getLong(0)).toSeq ==
      Seq(1999L, 1998L, 1997L))
  }

  test("TopN composes with the pushed range filter") {
    val df = spark.read.format(classOf[RecSource].getName).load(file(1000))
      .filter(col("id") >= 1500).orderBy(col("id")).limit(2)
    val d = logicalScanOf(df).description()
    assert(d.contains("bounds=[1500,") && d.contains("take_first=2"), d)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1500L, 1501L))
  }

  test("reported ordering elides a redundant per-partition sort") {
    val df = spark.read.format(classOf[RecSource].getName).load(file(500))
      .sortWithinPartitions("id")
    val hasSort = df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.SortExec => true
      case _ => false
    }
    assert(!hasSort, "scan reports id-ascending; the sort must vanish")
  }

  test("reported statistics come from headers and honor zone pruning") {
    val df = spark.read.format(classOf[RecSource].getName).load(file(800))
    val st = logicalScanOf(df)
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics].estimateStatistics()
    assert(st.numRows().getAsLong == 800L)
    assert(st.sizeInBytes().getAsLong == 800L * 24)
  }

  test("a filter declines agg pushdown: headers cannot answer filtered counts") {
    val df = spark.read.format(classOf[RecSource].getName).load(file(500))
      .filter(col("id") >= 1100)
      .agg(count(lit(1)), min(col("id")))
    assert(!logicalScanOf(df).description().contains("AGG-PUSHED"),
      "filtered aggregates must fall back to the record scan")
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1)) == ((400L, 1100L)))
  }
}
