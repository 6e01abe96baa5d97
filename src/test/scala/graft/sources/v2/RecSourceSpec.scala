package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class RecSourceSpec extends SparkSpec {

  private def file(n: Long): String = {
    val path = java.nio.file.Files.createTempDirectory("rec").toString +
      "/t.rec"
    RecSource.write(path, 1000L, n)
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

  test("an unsupported predicate stays above the scan, others push") {
    val df = spark.read.format(classOf[RecSource].getName).load(file(200))
      .filter(col("id") >= 1050 && col("tag") === "t051")
    val scan = scanOf(df)
    assert(scan.description().contains("bounds=[1050,"))
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1051L, 1151L))
  }
}
