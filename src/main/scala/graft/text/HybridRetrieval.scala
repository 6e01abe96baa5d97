package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + semantic retrieval via reciprocal-rank fusion
  * (Cormack/Clarke/Büttcher, SIGIR 2009): fuse a BM25 ranking and an
  * embedding-cosine ranking with score = Σ 1/(K + rank). The reference
  * retrieves with either keyword filters (ojd_daps/dqa/data_getters.py)
  * or FAISS vector search (labs/deduplication/faiss_utils.py); RRF is
  * the standard way a user of both would combine them, so the engine
  * ships it as one composed operator.
  *
  * Shape at scale: both input rankings are top-k (TakeOrderedAndProject
  * on the BM25 side, a broadcast-query scan on the ANN side), so the
  * fusion join touches 2k rows regardless of corpus size — the full
  * outer join and final sort are driver-trivial. RRF arithmetic is
  * 1/(K+rank) over small ints: bit-identical across engines, no
  * stability tricks needed beyond the 6-dp display rounding.
  */
object HybridRetrieval {

  /** Fuse a BM25 top-k frame (doc_id, score, rank) with a brute-cosine
    * top-k frame (query_id, neighbor_id, cos, rn) under RRF with
    * constant `kRrf`, keeping the `kFinal` best fused docs. A doc absent
    * from one ranking contributes 0 from that side (standard RRF).
    * Ranking happens on the ROUNDED fused score with doc_id tiebreak so
    * the result is stable across engines.
    */
  def fuse(bm: DataFrame, ann: DataFrame, kRrf: Int, kFinal: Int): DataFrame = {
    val fused = bm.select(col("doc_id"), col("rank").as("bm_rank"))
      .join(
        ann.select(col("neighbor_id").as("doc_id"), col("rn").as("ann_rank")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("bm_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(kRrf) + col("ann_rank")), lit(0.0)),
          6).as("rrf"))
    fused.orderBy(desc("rrf"), asc("doc_id")).limit(kFinal)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("rrf"), asc("doc_id"))))
  }

  private def oracleSql(terms: Seq[String], queryId: Long, k: Int,
      kRrf: Int, kFinal: Int): String = {
    val ts = Bm25.termScoresSql(terms)
    s"""WITH ${Bm25.tokStatsCte},
       |bm AS (
       |  SELECT doc_id, bm_rank FROM (
       |    SELECT doc_id,
       |      CAST(row_number() OVER (ORDER BY round($ts, 4) DESC,
       |        doc_id ASC) AS INT) AS bm_rank
       |    FROM tok CROSS JOIN stats
       |    WHERE round($ts, 4) > 0)
       |  WHERE bm_rank <= $k),
       |ann AS (
       |  SELECT doc_id, ann_rank FROM (
       |    SELECT b.vec_id AS doc_id,
       |      CAST(row_number() OVER (ORDER BY round(list_cosine_similarity(
       |        q.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) DESC,
       |        b.vec_id ASC) AS INT) AS ann_rank
       |    FROM embeddings b,
       |      (SELECT embedding FROM embeddings WHERE vec_id = $queryId) q
       |    WHERE b.vec_id <> $queryId)
       |  WHERE ann_rank <= $k),
       |fused AS (
       |  SELECT coalesce(bm.doc_id, ann.doc_id) AS doc_id,
       |    round(coalesce(1.0 / ($kRrf + bm_rank), 0) +
       |          coalesce(1.0 / ($kRrf + ann_rank), 0), 6) AS rrf
       |  FROM bm FULL OUTER JOIN ann ON bm.doc_id = ann.doc_id)
       |SELECT doc_id, rrf,
       |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INT)
       |    AS rank
       |FROM fused
       |ORDER BY rrf DESC, doc_id ASC
       |LIMIT $kFinal""".stripMargin
  }

  private val q = Q(
    "t_hybrid_retrieval",
    (s, d) => {
      val t = Tables(s, d)
      val bm = Bm25.topK(t.documents, Seq("spark", "join"), 20)
      val ann = graft.similarity.SimilarityQueries.bruteForceTopK(
        t.embeddings, t.embeddings.filter(col("vec_id") === 0), 20)
      fuse(bm, ann, 60, 10)
    },
    Some(oracleSql(Seq("spark", "join"), 0L, 20, 60, 10)),
  )

  def queries: Seq[Q] = Seq(q)
}
