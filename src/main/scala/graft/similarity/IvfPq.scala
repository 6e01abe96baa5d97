package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ — the production ANN architecture (FAISS `IndexIVFPQ`,
  * non-residual form): the IVF coarse quantizer prunes the corpus to
  * `nprobe` inverted lists per query, and PQ asymmetric distance ranks
  * the surviving candidates from 16-byte codes. The two registered
  * halves compose directly: `ann_ivf_topk` supplies candidates,
  * `ann_pq_topk`'s ADC supplies the ranking — this row is their
  * composition under ONE oracle, the shape that actually serves
  * billion-vector retrieval (scan cost = |probed lists| · M byte-code
  * lookups; raw floats never leave the index build).
  *
  * Scale shape: both index artifacts are trained offline and memoized
  * (the IVF index and PQ codebook/codes ride the shared plan-keyed
  * cache), probes broadcast, and the candidate join is an equi join on
  * list_id — nothing pairwise, nothing corpus-shuffling. Determinism is
  * inherited: both builds are seed-deterministic with decimal-stable
  * Lloyd steps, so the full composition replays in SQL.
  */
object IvfPq {

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val (indexedFull, packed) =
      SimilarityQueries.buildIvfIndex(corpus, nlist)
    val probes = SimilarityQueries.withNearest(queries, packed, nprobe)
      .select(col("vec_id").as("query_id"), explode(col("lists")).as("l"))
      .select(col("query_id"), col("l").getField("cid").as("list_id"))
    val cand = indexedFull.select(col("vec_id"), col("list_id"))
      .join(broadcast(probes), "list_id")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(asc("adc"), asc("neighbor_id"))
    ProductQuantization.adcScores(corpus, queries)
      .join(cand, Seq("query_id", "neighbor_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc_dist"), col("rn"))
  }

  private val q = Q(
    "ann_ivfpq_topk",
    (s, d) => {
      val e = Tables(s, d).embeddings
      ivfPqTopK(e, e.filter(col("vec_id") < 10), 5)
    },
    Some {
      val dvk = SimilarityQueries.dotSql("en.v", "k.c", 64)
      s"""WITH ${SimilarityQueries.ivfOracleCtes(dim = 64, nlist = 16,
        nassign = 1)},
         |probes AS (
         |  SELECT vec_id AS query_id, cid AS list_id FROM (
         |    SELECT en.vec_id, k.cid,
         |      row_number() OVER (PARTITION BY en.vec_id
         |        ORDER BY -(($dvk) / (en.nrm * k.cn)), k.cid) AS rn
         |    FROM en CROSS JOIN cn k WHERE en.vec_id < 10)
         |  WHERE rn <= 4),
         |cand AS (
         |  SELECT DISTINCT p.query_id, i.vec_id AS neighbor_id
         |  FROM probes p JOIN idx i USING (list_id)
         |  WHERE i.vec_id <> p.query_id),
         |${ProductQuantization.adcCtes}
         |SELECT query_id, neighbor_id, round(adc_raw, 6) AS adc_dist, rn
         |FROM (
         |  SELECT a.query_id, a.neighbor_id, a.adc_raw,
         |    CAST(row_number() OVER (PARTITION BY a.query_id
         |      ORDER BY a.adc_raw, a.neighbor_id) AS INT) AS rn
         |  FROM adcv a JOIN cand c
         |    ON a.query_id = c.query_id AND a.neighbor_id = c.neighbor_id)
         |WHERE rn <= 5""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
