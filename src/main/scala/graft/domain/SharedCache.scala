package graft.domain

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.UUID

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
  *
  * Concurrent writers: each writer builds into a private temp dir under
  * the cache root and publishes with a single rename, so a reader can
  * never observe a half-written entry and two racing writers cannot
  * interleave files. The loser of a publish race deletes its temp copy
  * and reads the winner's — acceptable because entries are
  * content-addressed (both writers computed the same thing). On object
  * stores where rename is copy-not-atomic (raw S3A), this degrades to
  * the idempotent double-write, which is still correct for the same
  * reason.
  */
object SharedCache {

  /** Default cache root shared by all cached stages in this process —
    * override per-call for cluster deployments (HDFS/S3A path).
    */
  def defaultRoot: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_shared_cache"

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

  /** Build into a temp dir, publish via rename iff the destination is
    * still absent; otherwise discard — some other writer won the race
    * with an identical (content-addressed) result.
    */
  private def writePublished(df: => DataFrame, fs: FileSystem,
      dest: Path): Unit = {
    val tmp = new Path(dest.getParent,
      s".tmp-${dest.getName}-${UUID.randomUUID().toString.take(8)}")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(dest) || !fs.rename(tmp, dest)) fs.delete(tmp, true)
    // Hadoop rename nests src under dest when dest was created between
    // the exists check and the rename — remove any such stray child.
    val stray = new Path(dest, tmp.getName)
    if (fs.exists(stray)) fs.delete(stray, true)
  }

  private def getOrBuild(spark: SparkSession, dir: String)
      (build: => DataFrame): DataFrame = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path, "_SUCCESS")))
      writePublished(build, fs, path)
    spark.read.parquet(dir)
  }

  /** Write `df` as parquet under `root/<name>-<key>` unless that path is
    * already complete (`_SUCCESS` marker), then return a reader over the
    * materialised copy. Callers pass `planKey(df)` (default) for
    * source-hash semantics, or a fixed key for explicit versioning.
    */
  def materialise(df: DataFrame, root: String, name: String,
      key: Option[String] = None): DataFrame = {
    val k = key.getOrElse(planKey(df))
    getOrBuild(df.sparkSession, s"$root/$name-${k.take(16)}")(df)
  }

  /** By-name variant for stages whose CONSTRUCTION is itself expensive
    * (iterative algorithms like connected components run jobs while the
    * frame is being built): on a cache hit the builder never executes.
    * `key` must encode everything the result depends on — inputs plus a
    * logic version tag — exactly the reference's source-hash contract
    * (the caller bumps the tag when the stage's logic changes).
    */
  def materialiseWith(spark: SparkSession, root: String, name: String,
      key: String)(build: => DataFrame): DataFrame =
    getOrBuild(spark, s"$root/$name-${md5Hex(key).take(16)}")(build)
}
