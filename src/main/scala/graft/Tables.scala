package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md).
  *
  * Each loader is a plain `spark.read.parquet` — Catalyst pushes filters
  * and prunes columns into the scan, so callers never pre-materialise.
  * At cluster scale these would be partitioned tables; the API is the same.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a long we
    * convert to micros (lossless here — the generator emits µs precision).
    */
  def events: DataFrame = {
    val raw = t("events")
    if (raw.schema("ts").dataType == LongType)
      // integer `div`, not `/` (which is double and loses ns precision)
      raw.withColumn("ts",
        timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
