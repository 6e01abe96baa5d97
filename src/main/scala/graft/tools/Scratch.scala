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
    val t = graft.Tables(spark, d)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    val ads = graft.domain.AdsFixture.ads(t)
    val links = graft.domain.AdsFixture.links(t)
    time("ads view count")(ads.count())
    time("links count")(links.count())
    time("dup subgraphs (CC)") {
      graft.domain.DedupPipeline.duplicateSubgraphs(links).count()
    }
    time("splitcomps fresh") {
      graft.domain.DedupPipeline.subgraphsByLocation(
        graft.domain.DedupPipeline.duplicateSubgraphs(links), ads).count()
    }
    val cached = graft.domain.SharedCache.materialise(
      graft.domain.DedupPipeline.subgraphsByLocation(
        graft.domain.DedupPipeline.duplicateSubgraphs(links), ads),
      s"${System.getProperty("java.io.tmpdir")}/graft_scratch_cache", "sc")
    time("splitcomps cached read")(cached.count())
    time("snapshot w/ cached comps") {
      graft.domain.DedupPipeline.snapshotAds(ads, links,
        "1996-03-01", "1996-04-30",
        precomputedGraphs = Some(cached)).count()
    }
    time("snapshot again") {
      graft.domain.DedupPipeline.snapshotAds(ads, links,
        "1996-03-01", "1996-04-30",
        precomputedGraphs = Some(cached)).count()
    }
    time("weekly w/ cached comps") {
      graft.domain.Getters.weeklyAds(spark, ads, links,
        java.time.LocalDate.parse("1996-03-04"),
        java.time.LocalDate.parse("1996-05-27"),
        precomputedGraphs = Some(cached)).count()
    }
    // surface-forms tf-idf stage breakdown
    time("sf: build+dedupe")(
      graft.Registry.byName("dom_surface_forms_build").run(spark, d).count())
    time("sf: tfidf full")(
      graft.Registry.byName("dom_surface_forms_tfidf").run(spark, d).count())
    time("sf: tfidf again")(
      graft.Registry.byName("dom_surface_forms_tfidf").run(spark, d).count())
    spark.stop()
  }
}
