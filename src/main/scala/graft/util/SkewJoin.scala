package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins (SURVEY §2 "optimize for scale").
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one side has a handful of pathological keys and
  * the other side is small enough to replicate: the skewed side gets a
  * random-but-deterministic salt in [0, salts), the dimension side is
  * exploded across all salt values, and the join key becomes
  * (key, salt) — fanning one hot partition out into `salts` tasks.
  *
  * Semantics are identical to `left.join(right, key)` (inner).
  */
object SkewJoin {

  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    // deterministic salt from a stable row hash (no RNG: reproducible)
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)),
        lit(salts)))
    val expanded = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    // pin the join's parallelism: a salted join exists because per-row
    // WORK dwarfs per-row bytes, and AQE sizes post-shuffle stages by
    // bytes — it will coalesce the small salted shuffle back onto one
    // task and undo the fan-out (measured: a 42 s one-task verify stage
    // at sf0.1). User repartitions are exempt from AQE coalescing, and
    // keying them on exactly the join keys adds no extra exchange.
    // The partition COUNT is decoupled from the salt count: hashing
    // (key, salt) into exactly `salts` buckets leaves ~1/e of them empty
    // by collision, and on clusters with parallelism > salts it would cap
    // the join below the available cores.
    val parts = math.max(salts,
      skewed.sparkSession.sparkContext.defaultParallelism)
    salted.repartition(parts, col(key), col("__salt"))
      .join(expanded.repartition(parts, col(key), col("__salt")),
        Seq(key, "__salt"))
      .drop("__salt")
  }
}
