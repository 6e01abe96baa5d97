package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity pass every retrieval stack runs between ANN top-N and
  * the consumer (RAG context assembly, dedup of retrieved passages):
  * greedily pick the candidate maximising
  * λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s), so near-duplicates of an
  * already-selected passage are displaced by relevant-but-different
  * ones. λ = 1/2 here, which scales both terms equally — the argmax
  * order is exactly `rel − maxsim`, kept in integer 1e-4 units (4-dp
  * cosine × 10000) so every comparison is BIGINT and the whole greedy
  * trajectory is engine- and partitioning-exact. Other λ values stay
  * exact as dyadic-rational weights (the [[graft.operators]] EWMA
  * trick); the DIVERSITY structure, not the constant, is the operator.
  *
  * Scale: candidate generation is the only corpus-sized stage (broadcast
  * query over a streamed scan, [[SimilarityQueries.bruteForceTopK]]'s
  * shape — swap in the IVF probe at fleet scale). Everything after runs
  * on the N=[[Candidates]] retrieved rows: the N² sim matrix and
  * [[Select]] greedy rounds never touch the corpus, so re-rank cost is
  * constant in corpus size. The greedy argmax is inherently sequential
  * ([[Select]] bounded rounds of tiny jobs) — that sequentiality is the
  * algorithm, not a scaling defect.
  */
object MmrRerank {

  val Candidates = 20
  val Select = 8

  import SimilarityQueries.dot

  private def units(c: org.apache.spark.sql.Column) =
    round(c * 10000).cast("long")

  /** @param emb (vec_id, embedding) corpus including the query row.
    * @return (step, vec_id, rel_u, maxsim_u) — selection order, the
    *   candidate's relevance and its max similarity to the prior
    *   selection at pick time (NULL for the first pick), in 1e-4 units.
    */
  def rerank(emb: DataFrame, queryId: Long): DataFrame = {
    val c = SimilarityQueries.withNorm(emb)
    val q = c.filter(col("vec_id") === queryId)
    val scored = broadcast(q.alias("q"))
      .join(c.alias("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("c.vec_id").as("id"),
        col("c.embedding").as("emb"), col("c.nrm").as("nrm"),
        units(round(dot(col("q.embedding"), col("c.embedding"))
          / (col("q.nrm") * col("c.nrm")), 4)).as("rel_u"))
    val cand = scored.orderBy(desc("rel_u"), asc("id")).limit(Candidates)
      .localCheckpoint(true)
    val sim = cand.alias("a")
      .join(cand.alias("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"),
        units(round(dot(col("a.emb"), col("b.emb"))
          / (col("a.nrm") * col("b.nrm")), 4)).as("u"))
      .localCheckpoint(true)
    val slim = cand.select("id", "rel_u")
    var selected = slim.orderBy(desc("rel_u"), asc("id")).limit(1)
      .select(lit(1).as("step"), col("id"), col("rel_u"),
        lit(null).cast("long").as("maxsim_u"))
      .localCheckpoint(false)
    for (i <- 2 to Select) {
      val ms = sim
        .join(selected.select(col("id").as("b")), "b")
        .groupBy(col("a").as("id")).agg(max(col("u")).as("maxsim_u"))
      val pick = slim
        .join(ms, "id")
        .join(selected.select("id"), Seq("id"), "left_anti")
        .withColumn("score", col("rel_u") - col("maxsim_u"))
        .orderBy(desc("score"), asc("id"))
        .limit(1)
      selected = selected.union(pick
        .select(lit(i).as("step"), col("id"), col("rel_u"),
          col("maxsim_u")))
        .localCheckpoint(false)
    }
    selected.select(col("step"), col("id").as("vec_id"),
      col("rel_u"), col("maxsim_u"))
  }

  private def oracleSql: String = {
    val cos = (x: String, y: String) =>
      s"CAST(round(round(list_cosine_similarity($x.embedding::DOUBLE[], " +
        s"$y.embedding::DOUBLE[]), 4) * 10000) AS BIGINT)"
    val steps = (2 to Select).map { i =>
      s"""sel$i AS MATERIALIZED (
         |  SELECT CAST($i AS INT) AS step, c.id, c.rel_u, ms.m AS maxsim_u
         |  FROM cand c
         |  JOIN (SELECT s.a AS id, max(s.u) AS m
         |        FROM sim s JOIN acc${i - 1} p ON s.b = p.id
         |        GROUP BY s.a) ms ON c.id = ms.id
         |  WHERE c.id NOT IN (SELECT id FROM acc${i - 1})
         |  ORDER BY (c.rel_u - ms.m) DESC, c.id ASC LIMIT 1),
         |acc$i AS MATERIALIZED (
         |  SELECT * FROM acc${i - 1} UNION ALL SELECT * FROM sel$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH cand AS MATERIALIZED (
       |  SELECT c.vec_id AS id, ${cos("q", "c")} AS rel_u
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id = 0 AND c.vec_id <> 0
       |  ORDER BY rel_u DESC, id ASC LIMIT $Candidates),
       |sim AS MATERIALIZED (
       |  SELECT a.id AS a, b.id AS b, ${cos("ea", "eb")} AS u
       |  FROM cand a JOIN cand b ON a.id <> b.id
       |  JOIN embeddings ea ON ea.vec_id = a.id
       |  JOIN embeddings eb ON eb.vec_id = b.id),
       |acc1 AS MATERIALIZED (
       |  SELECT CAST(1 AS INT) AS step, id, rel_u,
       |    CAST(NULL AS BIGINT) AS maxsim_u
       |  FROM cand ORDER BY rel_u DESC, id ASC LIMIT 1),
       |$steps
       |SELECT step, id AS vec_id, rel_u, maxsim_u FROM acc$Select"""
      .stripMargin
  }

  private val q = Q(
    "sim_mmr_rerank",
    (s, d) => rerank(
      Tables(s, d).embeddings.select("vec_id", "embedding"), 0L),
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
