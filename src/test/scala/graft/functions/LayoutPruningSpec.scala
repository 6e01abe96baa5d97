package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** EMPIRICAL evidence for the layout-key claims (f16/f17): a table
  * range-partitioned + sorted on the Hilbert key of its two filter
  * columns must let parquet min/max statistics prune row groups that a
  * 1-D sort (let alone a shuffled layout) cannot. Measured via the
  * scan's `numOutputRows` metric — rows surviving pushed-down row-group
  * and page pruning, before Spark's residual Filter.
  */
class LayoutPruningSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val n = 256
  private val rowsPerCell = 4

  private def grid = {
    val cells = n.toLong * n * rowsPerCell
    spark.range(0, cells).select(
      ((col("id") / rowsPerCell) % n).cast("int").as("x"),
      ((col("id") / rowsPerCell) / n).cast("int").as("y"))
  }

  private def writeLayout(key: org.apache.spark.sql.Column,
      dir: String): String = {
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_layout", dir).toString
    grid.withColumn("k", key)
      .repartitionByRange(64, col("k"))
      .sortWithinPartitions("k")
      .drop("k")
      .write.mode("overwrite").parquet(path)
    path
  }

  /** Rows the parquet scan emits AFTER pushed-filter pruning. NB the
    * action must run THIS df's plan (`count()` would build and execute a
    * separate aggregate plan, leaving these metrics at zero).
    */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    val rows = scans.map(_.metrics("numOutputRows").value).sum
    assert(rows > 0, "scan metric did not populate")
    rows
  }

  test("hilbert layout prunes a thin-y band; a 1-D x sort cannot") {
    val hilbertPath = writeLayout(Hilbert.hilbert_key(col("x"), col("y")), "hilbert")
    val xPath = writeLayout(col("x").cast("long"), "xsort")
    val pred = col("y") >= 100 && col("y") <= 115 // 1/16 of y, ALL of x
    val total = n.toLong * n * rowsPerCell
    val hRows = scannedRows(spark.read.parquet(hilbertPath).filter(pred))
    val xRows = scannedRows(spark.read.parquet(xPath).filter(pred))
    // x-sorted files each span the full y range — stats prune nothing
    assert(xRows > total * 9 / 10,
      s"x-sort unexpectedly pruned the y band: $xRows of $total")
    // hilbert files are contiguous curve blobs — most never touch the band
    info(s"thin-y band: hilbert scanned $hRows, x-sort $xRows, of $total")
    assert(hRows < total / 2,
      s"hilbert layout should prune most of the y band scan: $hRows of $total")
    assert(hRows < xRows / 2)
  }

  test("hilbert layout prunes a 2-D box to a near-minimal footprint") {
    val hilbertPath = writeLayout(Hilbert.hilbert_key(col("x"), col("y")), "hilbert2")
    val box = col("x").between(64, 79) && col("y").between(64, 79) // 1/256 area
    val total = n.toLong * n * rowsPerCell
    val hRows = scannedRows(spark.read.parquet(hilbertPath).filter(box))
    info(s"2-D box: hilbert scanned $hRows of $total")
    // the box is 1/256 of the data; allow generous slack for blob edges
    // and row-group granularity, but the scan must not read the table
    assert(hRows < total / 8,
      s"hilbert box scan read $hRows of $total rows")
  }
}
