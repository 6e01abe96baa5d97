package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization for embedding columns — the storage lever
  * at 100 TB: a 768-dim float32 vector (3 KB) becomes 768 bytes + one
  * float scale, a 4× cut, with top-k recall preserved to within a few
  * points. Quantize once at ingest; search either on the dequantized
  * floats (exactness path) or directly on int8 (SIMD path on a real
  * cluster).
  */
object Quantize {

  /** Adds (q: array<tinyint>, scale: float); q[i] = round(x[i]/scale),
    * scale = max|x|/127. Zero vectors get scale 1 to avoid div-by-zero.
    */
  def quantize(df: DataFrame, vecCol: String): DataFrame = {
    val absMax = array_max(transform(col(vecCol), x => abs(x)))
    df
      .withColumn("scale",
        when(absMax > 0, absMax / 127.0f).otherwise(lit(1.0f))
          .cast("float"))
      .withColumn("q",
        transform(col(vecCol),
          x => round(x / col("scale")).cast("tinyint")))
  }

  /** Reconstructs array<float> from (q, scale). */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, b => (b.cast("float") * scale).cast("float"))

  /** Round-trip: quantized table with reconstructed embeddings, ready to
    * drop into any cosine/ANN operator in place of the original column.
    */
  def reconstructed(df: DataFrame, vecCol: String): DataFrame =
    quantize(df, vecCol)
      .withColumn(vecCol, dequantize(col("q"), col("scale")))
      .drop("q", "scale")
}
