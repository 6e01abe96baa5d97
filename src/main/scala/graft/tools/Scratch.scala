package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry point (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def gcTime: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val name = args.headOption.getOrElse("d20_link_prediction")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val sweep = sys.env.get("SCRATCH_SWEEP").nonEmpty
    for (i <- 1 to reps) {
      if (sweep) { System.gc(); Thread.sleep(500) }
      val g0 = gcTime
      val t0 = System.nanoTime()
      graft.Registry.byName(name).run(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"run $i: $dt%6.2fs  gc=${(gcTime - g0) / 1000.0}%5.2fs")
    }
    spark.stop()
  }
}
