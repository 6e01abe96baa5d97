package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-path profiler: wipes the shared materialisation cache, then runs
  * each named query once from scratch — the cost a one-off pipeline run
  * pays (Bench's cold pass), but for a targeted query list with the CC
  * round log visible. Usage: runMain graft.tools.ColdTime [names...]
  */
object ColdTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val root = new org.apache.hadoop.fs.Path(
      graft.domain.SharedCache.defaultRoot)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(root, true)

    args.foreach { n =>
      val t0 = System.nanoTime()
      graft.Registry.byName(n).run(spark, d).count()
      println(f"$n%-32s cold=${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
