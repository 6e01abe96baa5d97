package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MAP@k (mean average precision) — the order-sensitive retrieval
  * metric beside [[SimilarityQueries]]'s recall@k (order-blind) and
  * NDCG@k (graded): AP rewards putting the relevant neighbours EARLY,
  *
  *   AP@k(q) = (1/min(R_q, k)) · Σ_{i ≤ k, rel_i} (rel-count@i / i)
  *
  * over the same brute top-k ranking (queries broadcast, corpus
  * streamed — the ANN-oracle-ceiling plan). Emitted per query so the
  * failing query is visible; the mean is one more row. Determinism:
  * each precision@i term is one IEEE divide of small exact ints, and
  * the per-query/global sums go through decimal(38,9) casts so
  * partitioning cannot reorder float additions.
  */
object MapAtK {

  val K = 10

  private val q = Q(
    "sim_map_at_k",
    (s, d) => {
      val e = Tables(s, d).embeddings
      val labels = e.select(col("vec_id"), col("label"))
      val top = SimilarityQueries
        .bruteForceTopK(e, e.filter(col("vec_id") < 10), K)
      val wq = Window.partitionBy("query_id").orderBy("rn")
      val scored = top
        .join(labels.select(col("vec_id").as("query_id"),
          col("label").as("ql")), "query_id")
        .join(labels.select(col("vec_id").as("neighbor_id"),
          col("label").as("nl")), "neighbor_id")
        .withColumn("rel", when(col("ql") === col("nl"), 1L).otherwise(0L))
        .withColumn("cumrel", sum(col("rel")).over(
          wq.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("term",
          when(col("rel") === 1L,
            col("cumrel").cast("double") / col("rn").cast("double"))
            .otherwise(0.0))
      val nRel = e.groupBy("label").agg(count(lit(1)).as("n_label"))
      val ideal = e.filter(col("vec_id") < 10)
        .join(broadcast(nRel), "label")
        .select(col("vec_id").as("query_id"),
          (col("n_label") - 1).as("n_rel"))
      scored.groupBy("query_id")
        .agg(sum(col("term").cast("decimal(38,9)")).cast("double")
          .as("ap_num"), sum(col("rel")).as("n_rel_at_k"))
        .join(ideal, "query_id")
        .select(col("query_id"), col("n_rel_at_k"), col("n_rel"),
          round(when(col("n_rel") === 0, 0.0)
            .otherwise(col("ap_num") /
              least(col("n_rel"), lit(K.toLong)).cast("double")), 6)
            .as("ap"))
    },
    Some(
      s"""WITH top AS (
         |  SELECT query_id, neighbor_id, rn FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY round(list_cosine_similarity(
         |          q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) DESC,
         |          c.vec_id ASC) AS rn
         |    FROM embeddings q JOIN embeddings c
         |      ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |  WHERE rn <= $K),
         |scored AS (
         |  SELECT t.query_id, t.rn,
         |    CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
         |  FROM top t
         |  JOIN embeddings ql ON ql.vec_id = t.query_id
         |  JOIN embeddings nl ON nl.vec_id = t.neighbor_id),
         |terms AS (
         |  SELECT query_id, rel,
         |    CASE WHEN rel = 1 THEN
         |      CAST(sum(rel) OVER (PARTITION BY query_id ORDER BY rn
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        AS DOUBLE) / CAST(rn AS DOUBLE)
         |    ELSE 0.0 END AS term
         |  FROM scored),
         |agg AS (
         |  SELECT query_id,
         |    CAST(sum(CAST(term AS DECIMAL(38,9))) AS DOUBLE) AS ap_num,
         |    CAST(sum(rel) AS BIGINT) AS n_rel_at_k
         |  FROM terms GROUP BY 1),
         |nrel AS (SELECT label, count(*) AS n_label
         |         FROM embeddings GROUP BY 1),
         |ideal AS (
         |  SELECT e.vec_id AS query_id,
         |    CAST(r.n_label - 1 AS BIGINT) AS n_rel
         |  FROM embeddings e JOIN nrel r ON e.label = r.label
         |  WHERE e.vec_id < 10)
         |SELECT a.query_id, a.n_rel_at_k, i.n_rel,
         |  round(CASE WHEN i.n_rel = 0 THEN 0.0
         |    ELSE a.ap_num / CAST(least(i.n_rel, $K) AS DOUBLE) END, 6)
         |    AS ap
         |FROM agg a JOIN ideal i ON a.query_id = i.query_id""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
