package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Skip-gram negative-sampling distribution (word2vec's unigram^¾
  * table) — the artifact an embedding-training pipeline materialises
  * next to the co-occurrence counts (t_skipgram_cooc): P_neg(w) ∝
  * count(w)^{3/4}, the damping that keeps frequent tokens from
  * dominating the negative draws.
  *
  * ENGINE-IDENTITY TRICK: `pow(x, 0.75)` is NOT guaranteed
  * correctly rounded (libm vs DuckDB may differ in the last ulp), so
  * the ¾ power is computed as sqrt(sqrt(x·x·x)) — multiplies and
  * square roots are all IEEE correctly-rounded, making the chain
  * bit-identical in any engine.
  *
  * Shape: the (token) hash agg, localCheckpoint'd so the weight
  * total and the per-token probability share ONE corpus pass; the
  * output and everything post-agg are vocab-bounded.
  */
object NegativeSampling {

  private val q = Q(
    "t_negative_sampling_table",
    (s, d) => {
      val counts = Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .withColumn("w", sqrt(sqrt(col("c").cast("double") *
          col("c").cast("double") * col("c").cast("double"))))
        .localCheckpoint(false)
      val tot = counts.agg(
        sum(col("w").cast(org.apache.spark.sql.types.DecimalType(30, 9)))
          .cast("double").as("tw"))
      counts.crossJoin(broadcast(tot))
        .select(col("tok"), col("c"),
          round(col("w"), 6).as("w"),
          round(col("w") / col("tw"), 12).as("p_neg"))
    },
    Some(
      """WITH counts AS (
        |  SELECT tok, count(*) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1),
        |ws AS (
        |  SELECT tok, c,
        |    sqrt(sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) * CAST(c AS DOUBLE)))
        |      AS w
        |  FROM counts),
        |tot AS (
        |  SELECT CAST(sum(CAST(w AS DECIMAL(30,9))) AS DOUBLE) AS tw FROM ws)
        |SELECT tok, c, round(w, 6) AS w, round(w / tw, 12) AS p_neg
        |FROM ws CROSS JOIN tot""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
