package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession

/** Times every registry query at the given sf dir, slowest first. */
object TimeAll {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val times = Registry.all.map { q =>
      val t0 = System.nanoTime()
      val n = try q.run(spark, sfDir).count()
      catch { case e: Throwable => println(s"ERROR ${q.name}: $e"); -1L }
      q.name -> ((System.nanoTime() - t0) / 1e9, n)
    }
    times.sortBy(-_._2._1).foreach { case (n, (t, rows)) =>
      println(f"$t%7.2fs  $n%-32s rows=$rows")
    }
    println(f"TOTAL ${times.map(_._2._1).sum}%.1fs")
    spark.stop()
  }
}
