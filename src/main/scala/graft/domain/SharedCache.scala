package graft.domain

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Content-addressed materialisation — the Spark analog of the
  * reference's shared disk cache (dqa/shared_cache.py:46-131), whose
  * cache keys are an md5 of the memoized function's *source code* so any
  * logic change invalidates the entry.
  *
  * Here the invalidation key is the canonicalized logical plan (what the
  * computation IS, post-analysis) plus the result schema: same plan →
  * parquet re-read, changed plan → recompute under a new path. Works on
  * any Hadoop filesystem (local, HDFS, S3A), so the cluster posture is
  * the same as the reference's S3-synced cache but without the
  * download/upload choreography — executors read the materialised
  * parquet directly.
  */
object SharedCache {

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Cache key derived from the dataframe's canonicalized analyzed plan —
    * the "hash of the source" analog: any change to the lineage (inputs,
    * filters, expressions) yields a new key.
    */
  def planKey(df: DataFrame): String =
    md5Hex(df.queryExecution.analyzed.canonicalized.toString)

  /** Write `df` as parquet under `root/<name>-<key>` unless that path is
    * already complete (`_SUCCESS` marker), then return a reader over the
    * materialised copy. Callers pass `planKey(df)` (default) for
    * source-hash semantics, or a fixed key for explicit versioning.
    */
  def materialise(df: DataFrame, root: String, name: String,
      key: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val k = key.getOrElse(planKey(df))
    val dir = s"$root/$name-${k.take(16)}"
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val complete = fs.exists(new Path(path, "_SUCCESS"))
    if (!complete)
      df.write.mode(SaveMode.Overwrite).parquet(dir)
    spark.read.parquet(dir)
  }

  /** By-name variant for stages whose CONSTRUCTION is itself expensive
    * (iterative algorithms like connected components run jobs while the
    * frame is being built): on a cache hit the builder never executes.
    * `key` must encode everything the result depends on — inputs plus a
    * logic version tag — exactly the reference's source-hash contract
    * (the caller bumps the tag when the stage's logic changes).
    */
  def materialiseWith(spark: org.apache.spark.sql.SparkSession,
      root: String, name: String, key: String)
      (build: => DataFrame): DataFrame = {
    val dir = s"$root/$name-${md5Hex(key).take(16)}"
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path, "_SUCCESS")))
      build.write.mode(SaveMode.Overwrite).parquet(dir)
    spark.read.parquet(dir)
  }
}
