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
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    time("warmup count")(docs.count())
    time("signatures only") {
      docs.select(col("doc_id"),
        graft.functions.TextSketches.minhash_signature(col("text")).as("sig"))
        .agg(count(lit(1))).head().getLong(0)
    }
    time("shingles only") {
      docs.select(col("doc_id"),
        graft.dedup.MinHashDedup.shingles(col("text")).as("sh"))
        .select(sum(size(col("sh")))).head().getLong(0)
    }
    time("candidates") {
      val sig = docs.select(col("doc_id"),
        graft.functions.TextSketches.minhash_signature(col("text")).as("sig"))
      val bandCols = (0 until 16).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until 4).map(r =>
            element_at(col("sig"), b * 4 + r + 1)): _*).as("key"))
      }
      val buckets = sig
        .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      buckets.alias("a").join(buckets.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    }
    time("full pairs") {
      graft.dedup.MinHashDedup.nearDupPairs(docs, 0.8).count()
    }
    spark.stop()
  }
}
