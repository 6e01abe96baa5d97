package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** kNN-graph construction — `build_kNN_matrix` / `build_graph`
  * (labs/skills/cluster_utils.py:357-434): keep each node's k most
  * similar neighbours, symmetrize (an edge survives if EITHER endpoint
  * ranked the other in its top k — the reference's `M = max(M, M.T)`),
  * no self-connections. The result feeds community detection
  * ([[graft.text.ConsensusClusters]]).
  *
  * Scoring is all-pairs here — the exactness baseline, same contract as
  * [[SimilarityQueries.bruteForceTopK]]. At 100 TB substitute the
  * LSH-bucketed candidate pairs (VectorDedup / MinHash banding) for the
  * self-join; the per-node rank + symmetrize stages below are unchanged
  * and stay shuffle-minimal: the rank is a grouped top-k via the bounded
  * [[graft.functions.TopKAgg]] Aggregator, whose map-side partial
  * aggregation caps the shuffle at k entries per node per partition
  * (a window row_number would move and sort the node's whole candidate
  * degree); the symmetrize is a projection (least/greatest) + distinct
  * on the already-small edge set. Ranking uses 4-dp-rounded cosine with
  * id tiebreak so results are stable across engines and partitionings.
  */
object KnnGraph {

  // per-vector norm computed once before the pair fan-out (n sqrt
  // evaluations instead of 2·n² — bit-identical: sqrt(dot(v,v)) is a
  // deterministic function of the row wherever it is evaluated); the
  // shared helper persists as the optimizer barrier
  private def withNorm(embeddings: DataFrame): DataFrame =
    SimilarityQueries.withNorm(embeddings)

  private def scoredCos(pairs: DataFrame): DataFrame =
    pairs.select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
      round(SimilarityQueries.dot(col("a.embedding"), col("b.embedding"))
        / (col("a.nrm") * col("b.nrm")), 4).as("cos"))

  private def rankAndSymmetrize(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKAgg(k))
    scored.groupBy(col("src"))
      .agg(topk(col("cos"), col("dst")).as("nn"))
      .select(col("src"), explode(col("nn")).as("e"))
      // cosine is symmetric bit-for-bit (same element order both ways),
      // so canonicalising endpoints + distinct merges the two directions
      .select(least(col("src"), col("e.id")).as("src"),
        greatest(col("src"), col("e.id")).as("dst"),
        col("e.score").as("cos"))
      .distinct()
  }

  /** Undirected kNN edges (src < dst) with their cosine weight —
    * all-pairs exactness baseline.
    */
  def knnGraph(embeddings: DataFrame, k: Int): DataFrame = {
    val e = withNorm(embeddings)
    rankAndSymmetrize(scoredCos(e.alias("a")
      .join(e.alias("b"), col("a.vec_id") =!= col("b.vec_id"))), k)
  }

  /** The scale path: candidate pairs restricted to a blocking key (LSH
    * bucket, label, temporal window) so the join is an equi-shuffle on
    * the block instead of a global cross product; rank + symmetrize are
    * unchanged. Top-k is per node WITHIN its block — the recall/cost
    * trade every blocked ANN makes (the brute variant is the recall
    * ceiling to measure against).
    */
  def knnGraphBlocked(embeddings: DataFrame, k: Int,
      blockCol: String): DataFrame = {
    val e = withNorm(embeddings)
    rankAndSymmetrize(scoredCos(e.alias("a")
      .join(e.alias("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col("a.vec_id") =!= col("b.vec_id"))), k)
  }

  private val q = Q(
    "sim_knn_graph",
    (s, d) => knnGraph(Tables(s, d).embeddings, k = 5),
    Some(
      """WITH scored AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |    round(list_cosine_similarity(
        |      a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        |topk AS (
        |  SELECT src, dst, cos FROM (
        |    SELECT src, dst, cos,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY cos DESC, dst ASC) AS rn
        |    FROM scored)
        |  WHERE rn <= 5)
        |SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst,
        |  cos
        |FROM topk""".stripMargin),
  )

  private val qBlocked = Q(
    "sim_knn_graph_blocked",
    (s, d) => knnGraphBlocked(Tables(s, d).embeddings, k = 5,
      blockCol = "label"),
    Some(
      """WITH scored AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |    round(list_cosine_similarity(
        |      a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |topk AS (
        |  SELECT src, dst, cos FROM (
        |    SELECT src, dst, cos,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY cos DESC, dst ASC) AS rn
        |    FROM scored)
        |  WHERE rn <= 5)
        |SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst,
        |  cos
        |FROM topk""".stripMargin),
  )

  /** ANN kNN graph: IVF cell assignment as the blocking key — the
    * composition a big corpus actually runs (build the index once, block
    * candidates by cell, exact rank within the cell). Deterministic
    * end-to-end (decimal-stable Lloyd step), so it is hash-checked
    * against a full SQL replay; recall against the brute ceiling is
    * additionally pinned in KnnGraphSpec.
    */
  def ivfKnnGraph(embeddings: DataFrame, k: Int, nlist: Int = 16,
      nassign: Int = 2): DataFrame =
    knnGraphBlocked(
      SimilarityQueries.buildIvfIndex(embeddings, nlist, nassign)._1,
      k, "list_id")

  private val qIvf = Q(
    "sim_knn_graph_ivf",
    (s, d) => ivfKnnGraph(Tables(s, d).embeddings, k = 5),
    // the index build is deterministic (decimal-stable Lloyd step, cid
    // tiebreaks) so the full composition replays in SQL: index CTEs from
    // SimilarityQueries, pair candidates = share ≥1 of the 2 assigned
    // lists (DISTINCT mirrors TopKAgg's duplicate idempotence), rank by
    // 4-dp cosine with id tiebreak, symmetrize via least/greatest
    Some(
      s"""WITH ${SimilarityQueries.ivfOracleCtes(dim = 64, nlist = 16,
             nassign = 2)},
         |pairs AS (
         |  SELECT DISTINCT ia.vec_id AS src, ib.vec_id AS dst
         |  FROM idx ia JOIN idx ib
         |    ON ia.list_id = ib.list_id AND ia.vec_id <> ib.vec_id),
         |scored AS (
         |  SELECT p.src, p.dst,
         |    round((${SimilarityQueries.dotSql("a.v", "b.v", 64)})
         |      / (a.nrm * b.nrm), 4) AS cos
         |  FROM pairs p JOIN en a ON p.src = a.vec_id
         |               JOIN en b ON p.dst = b.vec_id),
         |topk AS (
         |  SELECT src, dst, cos FROM (
         |    SELECT src, dst, cos,
         |      row_number() OVER (PARTITION BY src
         |                         ORDER BY cos DESC, dst ASC) AS rn
         |    FROM scored)
         |  WHERE rn <= 5)
         |SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst,
         |  cos
         |FROM topk""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q, qBlocked, qIvf)
}
