package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PQ + exact refine — the production ANN serving pattern that
  * completes the family (FAISS's `IndexRefineFlat`): the compressed
  * index (ann_pq's asymmetric-distance scan over byte codes) nominates
  * a candidate pool C ≫ k per query, and only those C rows are
  * re-ranked with EXACT full-precision distances. The corpus is still
  * scanned as 16-byte codes — the expensive exact math touches
  * C·|queries| vectors, not the corpus — which is why refine recovers
  * near-brute recall at PQ scan cost.
  *
  * The exact L2² is a left-associated 64-term fold (`aggregate` over
  * `zip_with`), the same IEEE sequence the oracle spells out term by
  * term; ranking rounds to 6 dp with neighbor tie-break.
  *
  * Shape: the PQ map-scan (broadcast codebook∥queries, zero corpus
  * shuffle) + a candidate-keyed equi join of C·|queries| rows against
  * the corpus + a k-row window per query.
  */
object AnnRefine {

  val C = 20 // candidate pool per query (PQ stage)
  val K = 5  // final exact-ranked neighbours

  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, t) => acc + t)

  def refineTopK(corpus: DataFrame, queries: DataFrame): DataFrame = {
    val wAdc = Window.partitionBy("query_id")
      .orderBy(asc("adc"), asc("neighbor_id"))
    val cand = ProductQuantization.adcScores(corpus, queries)
      .withColumn("crn", row_number().over(wAdc))
      .filter(col("crn") <= C)
      .select("query_id", "neighbor_id")
    val exact = cand
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv")), "neighbor_id")
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(l2(col("qv").cast("array<double>"),
          col("nv").cast("array<double>")), 6).as("l2_dist"))
    val wExact = Window.partitionBy("query_id")
      .orderBy(asc("l2_dist"), asc("neighbor_id"))
    exact.withColumn("rn", row_number().over(wExact))
      .filter(col("rn") <= K)
  }

  private def l2FullSql(a: String, b: String): String =
    (1 to ProductQuantization.Dim).map(i =>
      s"(($a[$i]) - ($b[$i])) * (($a[$i]) - ($b[$i]))").mkString(" + ")

  private val q = Q(
    "ann_pq_refine_topk",
    (s, d) => {
      val e = Tables(s, d).embeddings
      refineTopK(e, e.filter(col("vec_id") < 10))
    },
    Some(
      s"""WITH en AS MATERIALIZED (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |${ProductQuantization.adcCtes},
         |cand AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY adc_raw, neighbor_id) AS crn
         |    FROM adcv)
         |  WHERE crn <= $C),
         |exact AS (
         |  SELECT c.query_id, c.neighbor_id,
         |    round(${l2FullSql("q.v", "t.v")}, 6) AS l2_dist
         |  FROM cand c
         |  JOIN en t ON c.neighbor_id = t.vec_id
         |  JOIN en q ON c.query_id = q.vec_id)
         |SELECT query_id, neighbor_id, l2_dist,
         |  CAST(rn AS INT) AS rn
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY l2_dist, neighbor_id) AS rn
         |  FROM exact)
         |WHERE rn <= $K""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
