package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Dynamic partition overwrite — the incremental-backfill write
  * pattern a partitioned lake lives on: re-running one day/language
  * slice must replace ONLY the partitions present in the incoming
  * batch (`partitionOverwriteMode=dynamic`), where the default
  * STATIC mode would truncate the whole table first. The query
  * writes the documents table partitioned by lang, overwrites the
  * `lang=en` slice with recomputed rows (n_chars doubled — a
  * "reprocessed" backfill), and reads the final state back: en rows
  * new, every other partition untouched — exactly what the oracle
  * SQL states about the source table.
  *
  * Scale: partition-targeted rewrites are O(changed slice), not
  * O(table) — at 100 TB the difference between a nightly backfill
  * and an impossible one.
  */
object DynamicOverwrite {

  private val q = Q(
    "s38_dynamic_partition_overwrite",
    (s, d) => {
      val out = Files.createTempDirectory("s38_dpo").toString
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("n_chars"), col("lang"))
      docs.write.mode(SaveMode.Overwrite)
        .partitionBy("lang").parquet(out)
      // backfill: recompute ONLY the en slice (doubled n_chars)
      docs.filter(col("lang") === "en")
        .withColumn("n_chars", col("n_chars") * 2)
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang").parquet(out)
      s.read.parquet(out).select("doc_id", "n_chars", "lang")
    },
    Some(
      """SELECT doc_id,
        |  CASE WHEN lang = 'en' THEN n_chars * 2 ELSE n_chars END
        |    AS n_chars,
        |  lang
        |FROM documents""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
