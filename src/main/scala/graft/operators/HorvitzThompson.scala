package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Horvitz–Thompson estimation over the PPS systematic sample — the
  * closure of the sampling family: t_weighted_systematic_sample picks
  * units ∝ size; HT's 1/π weighting turns that sample back into
  * UNBIASED population estimates, and this row emits estimate and
  * truth side by side so the gate QUANTIFIES the estimator (the char
  * total reconstructs exactly to ± one stride; the doc count, whose
  * variable is uncorrelated with the size weight, is the honest HT
  * case).
  *
  * Determinism: the sample is the engine's deterministic systematic
  * walk (integer boundary placement), the char estimate is pure
  * BIGINT (stride × hit count), and the HT count estimate sums
  * stride/w_i doubles through a decimal(38,9) cast. One pass for the
  * sample, one tiny agg for truth.
  */
object HorvitzThompson {

  val Stride = 8192L
  val Shards = 16

  private val q = Q(
    "a68_horvitz_thompson",
    (s, d) => {
      val base = Tables(s, d).documents
        .select(col("doc_id"), col("n_chars").as("w"))
        .withColumn("shard", pmod(col("doc_id"), lit(Shards.toLong)))
      val wloc = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = base.withColumn("cum_local", sum(col("w")).over(wloc))
      val offs = base.groupBy("shard").agg(sum(col("w")).as("tot"))
        .withColumn("offset",
          coalesce(sum(col("tot")).over(
            Window.orderBy("shard")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("shard", "offset")
      val hits = local.join(broadcast(offs), "shard")
        .withColumn("cum", col("offset") + col("cum_local"))
        .withColumn("n_hits",
          expr(s"cum div ${Stride}L - (cum - w) div ${Stride}L"))
        .filter(col("n_hits") > 0)
      val est = hits.agg(
        count(lit(1)).as("n_sampled"),
        sum(col("n_hits")).as("n_hits_total"),
        sum((col("n_hits") * lit(Stride)).cast("double") /
          col("w").cast("double") cast "decimal(38,9)")
          .cast("double").as("ht_docs_raw"))
      val truth = base.agg(count(lit(1)).as("true_docs"),
        sum(col("w")).as("true_chars"))
      est.crossJoin(broadcast(truth))
        .select(col("n_sampled"), col("n_hits_total"),
          (col("n_hits_total") * Stride).as("est_chars"),
          col("true_chars"),
          round(col("ht_docs_raw"), 6).as("ht_docs"),
          col("true_docs"))
    },
    Some(
      s"""WITH base AS (
         |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         |    doc_id % $Shards AS shard
         |  FROM documents),
         |loc AS (
         |  SELECT doc_id, w, shard,
         |    CAST(sum(w) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_local
         |  FROM base),
         |offs AS (
         |  SELECT shard,
         |    CAST(coalesce(sum(tot) OVER (ORDER BY shard
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS offset
         |  FROM (SELECT shard, CAST(sum(w) AS BIGINT) AS tot
         |        FROM base GROUP BY 1)),
         |hits AS (
         |  SELECT l.doc_id, l.w,
         |    (l.cum_local + o.offset) // $Stride
         |      - (l.cum_local + o.offset - l.w) // $Stride AS n_hits
         |  FROM loc l JOIN offs o USING (shard)),
         |est AS (
         |  SELECT count(*) AS n_sampled,
         |    CAST(sum(n_hits) AS BIGINT) AS n_hits_total,
         |    CAST(sum(CAST(CAST(n_hits * $Stride AS DOUBLE)
         |      / CAST(w AS DOUBLE) AS DECIMAL(38,9))) AS DOUBLE)
         |      AS ht_docs_raw
         |  FROM hits WHERE n_hits > 0),
         |truth AS (
         |  SELECT count(*) AS true_docs, CAST(sum(w) AS BIGINT)
         |    AS true_chars
         |  FROM base)
         |SELECT n_sampled, n_hits_total,
         |  n_hits_total * $Stride AS est_chars, true_chars,
         |  round(ht_docs_raw, 6) AS ht_docs, true_docs
         |FROM est CROSS JOIN truth""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
