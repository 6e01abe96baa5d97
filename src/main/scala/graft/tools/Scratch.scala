package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry point (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val t = (si.completionTime.get - si.submissionTime.get) / 1000.0
          if (t > 0.15) {
            val scopes = si.rddInfos.flatMap(_.scope).map(_.name).distinct
            val m = si.taskMetrics
            println(f"    stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
              f"time=$t%6.2fs run=${m.executorRunTime / 1000.0}%6.2fs " +
              f"cpu=${m.executorCpuTime / 1e9}%6.2fs " +
              f"deser=${m.executorDeserializeTime / 1000.0}%5.2fs " +
              f"gc=${m.jvmGCTime / 1000.0}%5.2fs " +
              scopes.mkString(",").take(70))
          }
        }
      })
    val names = if (args.nonEmpty) args.toSeq
      else Seq("a17_table_profile", "t_bm25_topk")
    names.foreach { n =>
      val q = graft.Registry.byName(n)
      (1 to 3).foreach(i => time(s"$n run $i")(q.run(spark, d).count()))
    }
    spark.stop()
  }
}
