package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Matryoshka-style dimension-truncation evaluation: recall@5 of
  * retrieval over the first 16 of 64 dimensions against full-dimension
  * truth. The decision this number drives at 100 TB is a 4× cut in ANN
  * index memory and scan bandwidth — if prefix recall holds (as it does
  * for MRL-trained embeddings), the serving index stores the prefix and
  * the full vector stays in cold storage for rerank only.
  *
  * Both rankings ride the broadcast-queries brute shape; the truncated
  * side is the SAME plan over `slice(embedding, 1, 16)` — evaluating a
  * cheaper index costs exactly the cheaper index.
  */
object DimTruncation {

  val PrefixDim = 16

  private val q = Q(
    "sim_dim_truncation_recall",
    (s, d) => {
      val e = Tables(s, d).embeddings
      val qs = e.filter(col("vec_id") < 10)
      val truth = SimilarityQueries.bruteForceTopK(e, qs, 5)
        .select(col("query_id"), col("neighbor_id"))
      val eTrunc = e.select(col("vec_id"),
        slice(col("embedding"), 1, PrefixDim).as("embedding"))
      val approx = SimilarityQueries
        .bruteForceTopK(eTrunc, eTrunc.filter(col("vec_id") < 10), 5)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      truth.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall", col("n_hit") / lit(5.0))
    },
    Some(
      s"""WITH btk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY round(list_cosine_similarity(
         |          q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) DESC,
         |          c.vec_id ASC) AS rn
         |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 10)
         |  WHERE rn <= 5),
         |ttk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY round(list_cosine_similarity(
         |          (q.embedding[1:$PrefixDim])::DOUBLE[],
         |          (c.embedding[1:$PrefixDim])::DOUBLE[]), 4) DESC,
         |          c.vec_id ASC) AS rn
         |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 10)
         |  WHERE rn <= 5)
         |SELECT b.query_id, count(*) AS n_true,
         |  CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) / 5.0 AS recall
         |FROM btk b LEFT JOIN ttk t
         |  ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
         |GROUP BY 1""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
