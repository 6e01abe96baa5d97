package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.ConcurrentLinkedQueue

/** Parallelism auditor: runs queries warm and flags stages that executed
  * on ONE task for a meaningful wall time — the signature of AQE's
  * byte-based coalescing serialising a high-fanout stage (see SCALING.md
  * "Runtime planning"). Usage: runMain graft.tools.StageAudit [names...]
  */
object StageAudit {
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

    case class St(tasks: Int, secs: Double)
    val stages = new ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        for (sub <- si.submissionTime; done <- si.completionTime)
          stages.add(St(si.numTasks, (done - sub) / 1000.0))
      }
    })

    val names = if (args.nonEmpty) args.toSeq
      else Seq("d_ngram_jaccard_pairs", "d_minhash_lsh_pairs",
        "d_simhash_pairs", "dom_features", "d_embed_cosine_pairs",
        "ann_ivf_topk", "sim_knn_graph_blocked", "sim_knn_graph_ivf",
        "dom_weekly_stock", "dom_snapshot_ads", "j8_tiered_substring_match",
        "dom_detect_skills_cleaned", "t_bm25_topk", "d1_vectorise")
    names.foreach { n =>
      val q = graft.Registry.byName(n)
      q.run(spark, d).count() // warm
      // stage-completed events arrive async on the listener bus; give
      // the warm run's tail a moment to land before clearing, and the
      // measured run's tail a moment to land before reading
      Thread.sleep(300)
      stages.clear()
      val t0 = System.nanoTime()
      q.run(spark, d).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq
      val oneTask = ss.filter(s => s.tasks == 1 && s.secs > 0.25)
      val flag = if (oneTask.nonEmpty) " <== 1-TASK STAGES: " +
        oneTask.map(s => f"${s.secs}%.2fs").mkString(", ") else ""
      println(f"$n%-28s wall=$wall%6.2fs stages=${ss.size}%3d$flag")
    }
    spark.stop()
  }
}
