package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.ConcurrentLinkedQueue

/** Optimization-round probe: for each named query, reports warm wall
  * time under BOTH timed actions — `count()` (the bench's historical
  * action) and the noop sink (guide §1.4: computes every column, so
  * Catalyst cannot prune Window/Project subtrees the way it can under
  * count) — plus per-stage shape (tasks, seconds, shuffle bytes), so a
  * query's cost can be attributed to stages before any change is made.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.OptProbe <names…>
  */
object OptProbe {
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

    case class St(tasks: Int, secs: Double, shufRead: Long, shufWrite: Long,
        input: Long)
    val stages = new ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        for (sub <- si.submissionTime; done <- si.completionTime)
          stages.add(St(si.numTasks, (done - sub) / 1000.0,
            si.taskMetrics.shuffleReadMetrics.totalBytesRead,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten,
            si.taskMetrics.inputMetrics.bytesRead))
      }
    })

    def noop(n: String): Unit =
      graft.Registry.byName(n).run(spark, d)
        .write.format("noop").mode("overwrite").save()
    def cnt(n: String): Unit = { graft.Registry.byName(n).run(spark, d).count(); () }

    val names = args.toSeq
    names.foreach { n =>
      // warm both actions twice (codegen + shared-cache builds land here)
      cnt(n); noop(n); cnt(n); noop(n)
      def timed(f: String => Unit): Double = {
        val t0 = System.nanoTime(); f(n); (System.nanoTime() - t0) / 1e9
      }
      val tc = timed(cnt)
      Thread.sleep(200); stages.clear()
      val tn = timed(noop)
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq
      println(f"\n===== $n  count=$tc%6.2fs  noop=$tn%6.2fs  stages=${ss.size}")
      ss.sortBy(-_.secs).take(12).foreach { s =>
        println(f"  tasks=${s.tasks}%4d ${s.secs}%6.2fs  in=${s.input / 1048576.0}%7.1fMB  sr=${s.shufRead / 1048576.0}%7.1fMB  sw=${s.shufWrite / 1048576.0}%7.1fMB")
      }
    }
    spark.stop()
  }
}
