package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles WITHOUT per-group value buffering.
  *
  * Spark's built-in `percentile` UDAF (and DuckDB's `quantile_cont`)
  * holds every value of a group in an in-memory map — fine at test
  * scale, an executor-OOM hazard when one group holds 10¹⁰ rows. This
  * computes the identical np.percentile-style linear interpolation
  * from the (key, value) COUNT table instead: distinct values
  * cumulative-ranked per key, the two order statistics bracketing
  * rank = q·(n−1) picked by a conditional aggregate, one interpolation.
  * Memory is bounded by distinct values per partition, shuffles are
  * two key-hash exchanges, and every stage map-side combines.
  *
  * Interpolation replicates `PercentileBase.getPercentile` double
  * arithmetic exactly (rank = q·(n−1); lower + (higher−lower)·(rank−
  * ⌊rank⌋)), so results hash-match the built-in — the a4 parity chain
  * extends to this formulation unchanged.
  */
object OrderStats {

  /** @param qs (outputColumn, percentage) pairs.
    * @return one row per key group: keyCols ++ qs columns.
    */
  def percentilesByGroup(df: DataFrame, keyCol: String, valCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(valCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(keyCol).orderBy("__v")
    val ranked = counts
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__prev", col("__cum") - col("__c"))
    val ns = counts.groupBy(keyCol).agg(sum(col("__c")).as("__n"))
    val withN = ranked.join(broadcast(ns), keyCol)
    val aggs: Seq[Column] = qs.flatMap { case (name, q) =>
      val rank = lit(q) * (col("__n") - 1L).cast("double")
      val lo = floor(rank)
      val hi = ceil(rank)
      Seq(
        max(when(col("__prev") <= lo && lo < col("__cum"), col("__v")))
          .as(s"__lo_$name"),
        max(when(col("__prev") <= hi && hi < col("__cum"), col("__v")))
          .as(s"__hi_$name"),
        max(rank).as(s"__rank_$name"))
    }
    val picked = withN.groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
    val outCols: Seq[Column] = col(keyCol) +: qs.map { case (name, _) =>
      val lo = col(s"__lo_$name")
      val hi = col(s"__hi_$name")
      val rank = col(s"__rank_$name")
      val frac = rank - floor(rank)
      when(frac === 0.0, lo)
        .otherwise(lo.cast("double") +
          (hi.cast("double") - lo.cast("double")) * frac)
        .as(name)
    }
    picked.select(outCols: _*)
  }
}
