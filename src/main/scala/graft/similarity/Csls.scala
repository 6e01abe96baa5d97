package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CSLS re-ranking (cross-domain similarity local scaling, Conneau et
  * al. 2018) — the hubness correction every embedding-alignment /
  * retrieval stack applies on top of raw cosine: hub vectors that are
  * near EVERYONE win too many raw-cosine rankings, so each side's
  * mean top-k similarity is subtracted,
  *
  *   csls(q, y) = 2·cos(q, y) − r(q) − r(y)
  *
  * with r(·) the mean cosine of the vector's k nearest neighbours.
  * r(y) over the corpus is the expensive side — here exact (the
  * oracle-ceiling pattern: sample it at fleet scale, or reuse the
  * kNN graph d8 already maintains); cosines round to 6 dp before
  * ranking, ties by neighbor id, so both engines order identically.
  *
  * Shape: the r(y) pass is one blocked self-join feeding a bounded
  * per-vector top-k window (the kNN-graph shape); scoring is queries
  * × corpus with both penalty columns joined in; final rank is a
  * k-row window per query.
  */
object Csls {

  val K = 10   // neighbourhood size for the local scaling terms
  val TopK = 5 // returned neighbours per query

  private val q = Q(
    "sim_csls_rerank",
    (s, d) => {
      val e = SimilarityQueries.withNorm(Tables(s, d).embeddings)
      // 4 dp like ann_brute: list_cosine_similarity and the zip_with
      // fold differ in low bits; the round is the parity contract
      val pairCos = round(
        graft.functions.VectorOps.dot(col("a.embedding"),
          col("b.embedding")) / (col("a.nrm") * col("b.nrm")), 4)
      val allPairs = e.alias("a").join(e.alias("b"),
          col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
          pairCos.as("cos"))
        .localCheckpoint(false)
      val wTop = Window.partitionBy("x").orderBy(desc("cos"), asc("y"))
      val r = allPairs
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= K)
        .groupBy(col("x"))
        .agg((graft.util.Stable.dsum(col("cos"), 4) /
          lit(K.toDouble)).as("r"))
      val scored = allPairs.filter(col("x") < 10)
        .join(r.select(col("x"), col("r").as("rq")), "x")
        .join(broadcast(r.select(col("x").as("y"), col("r").as("ry"))), "y")
        .select(col("x").as("query_id"), col("y").as("neighbor_id"),
          round(lit(2.0) * col("cos") - col("rq") - col("ry"), 6)
            .as("csls"))
      val wRank = Window.partitionBy("query_id")
        .orderBy(desc("csls"), asc("neighbor_id"))
      scored.withColumn("rn", row_number().over(wRank))
        .filter(col("rn") <= TopK)
    },
    Some(
      s"""WITH en AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS x, b.vec_id AS y,
         |    round(list_cosine_similarity(a.v, b.v), 4) AS cos
         |  FROM en a JOIN en b ON a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT x, CAST(sum(CAST(cos AS DECIMAL(30,4))) AS DOUBLE) / CAST($K AS DOUBLE) AS r FROM (
         |    SELECT x, cos,
         |      row_number() OVER (PARTITION BY x
         |        ORDER BY cos DESC, y ASC) AS rn
         |    FROM pairs)
         |  WHERE rn <= $K GROUP BY 1),
         |scored AS (
         |  SELECT p.x AS query_id, p.y AS neighbor_id,
         |    round(2.0 * p.cos - rq.r - ry.r, 6) AS csls
         |  FROM pairs p
         |  JOIN r rq ON p.x = rq.x
         |  JOIN r ry ON p.y = ry.x
         |  WHERE p.x < 10)
         |SELECT query_id, neighbor_id, csls, CAST(rn AS INT) AS rn FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY csls DESC, neighbor_id ASC) AS rn
         |  FROM scored)
         |WHERE rn <= $TopK""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
