package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D1 — the pluggable vectorise operator. The reference runs SBERT
  * (flows/pre_enrich/vectorise_descriptions.py:18-60); model inference is
  * out of engine scope (SURVEY §2.6 D1), so the engine ships a
  * deterministic fallback embedder with the same operator shape:
  * `DataFrame → DataFrame` adding an `embedding: array<double>` column.
  *
  * Fallback = hashing-trick bag of words: each word hashed to one of
  * `dim` buckets (xxhash64), counts L2-normalised. Pure column algebra —
  * explode + pivot-free conditional sums, one shuffle keyed by doc.
  */
object Vectorise {

  /** `fnv = true` buckets with the repo's FNV-1a fold instead of XXH64 —
    * same operator, but SQL-replayable so the registered query gets a
    * hash-exact oracle. pmod-of-signed equals unsigned-mod only when
    * `dim` divides 2^64, so FNV mode requires a power-of-two `dim`.
    */
  def embed(docs: DataFrame, textCol: String, dim: Int = 64,
      fnv: Boolean = false): DataFrame = {
    require(!fnv || (dim & (dim - 1)) == 0, s"fnv mode needs power-of-2 dim, got $dim")
    val hashCol =
      if (fnv) graft.functions.TextSketches.fnv1a(col("w"))
      else xxhash64(col("w"))
    val tok = docs
      .withColumn("w", explode(split(col(textCol), " ")))
      .withColumn("bucket", pmod(hashCol, lit(dim)))
    val counts = (0 until dim).map(i =>
      sum(when(col("bucket") === i, 1).otherwise(0)).cast("double")
        .as(s"b$i"))
    val agg = tok.groupBy(col("doc_id"))
      .agg(counts.head, counts.tail: _*)
    val vec = array((0 until dim).map(i => col(s"b$i")): _*)
    val norm = sqrt(aggregate(vec, lit(0.0), (acc, x) => acc + x * x))
    agg
      .withColumn("embedding",
        transform(vec, x => when(norm > 0, x / norm).otherwise(x)))
      .select(col("doc_id") +: agg.columns.filterNot(c =>
        c == "doc_id" || c.startsWith("b")).map(col) :+ col("embedding"): _*)
  }
}
