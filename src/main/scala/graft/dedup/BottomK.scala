package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bottom-k distinct sketch + corpus resemblance estimation.
  *
  * The corpus-level companion to the per-document MinHash family: keep
  * the k SMALLEST hash values of a set (here: a corpus's distinct word
  * shingles). Bottom-k sketches are mergeable — bottomk(A ∪ B) =
  * bottomk(bottomk(A) ∪ bottomk(B)) — which is what makes them the
  * right shape for "how much does my training corpus overlap that
  * benchmark / that other crawl?" at 100 TB: each shard ships k longs,
  * never shingles. The resemblance estimator is the classic one
  * (Broder 1997, on the web corpus this engine targets):
  * Ĵ = |bottomk(A ∪ B) ∩ bottomk(A) ∩ bottomk(B)| / |bottomk(A ∪ B)|.
  *
  * Scale shape: the shingle scan is map-side (native shingles
  * expression + hll_hash, both codegen); the bottom-k itself is
  * two-phase — per (corpus, hash-shard) window prune to k rows FIRST
  * (32-way parallel, shuffles only ids), then a final k-of-(32·k)
  * prune — so no single task ever sorts a corpus's full hash set.
  * Exactness is unaffected: bottom-k of per-shard bottom-ks IS the
  * bottom-k. The demo splits `documents` into even/odd corpora; the
  * exact Jaccard rides along as the oracle's ground truth (computable
  * at test SF; at 100 TB you would publish only the estimate).
  *
  * Determinism: hashes are the replayable fnv1a∘fmix64 family, the
  * unsigned hash order is total (hashes are distinct post-`distinct`),
  * so both engines select the identical k values.
  */
object BottomK {

  val K = 256
  val Shards = 32

  /** Unsigned-order sort key for a signed-long hash: XOR with the sign
    * bit is the standard order-isomorphic map (no overflow under ANSI).
    */
  private def uord(h: Column): Column = h.bitwiseXOR(lit(Long.MinValue))

  /** Exact per-corpus bottom-k of `hashed(corpus, h)` (h distinct per
    * corpus), two-phase so the per-corpus sort never concentrates on
    * one task.
    */
  def corpusBottomK(hashed: DataFrame, k: Int): DataFrame = {
    val w1 = Window.partitionBy("corpus", "shard").orderBy(uord(col("h")))
    val pre = hashed
      .withColumn("shard", pmod(col("h"), lit(Shards.toLong)))
      .withColumn("rn", row_number().over(w1)).filter(col("rn") <= k)
      .drop("shard", "rn")
    val w2 = Window.partitionBy("corpus").orderBy(uord(col("h")))
    pre.withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .drop("rn")
  }

  private val q = Q(
    "t_corpus_resemblance",
    (s, d) => {
      val docs = Tables(s, d).documents
      val sh = docs.select((col("doc_id") % 2).cast("int").as("corpus"),
        explode(array_distinct(
          graft.functions.TextSketches.shingles(col("text"), 3))).as("g"))
      val hashed = sh.select(col("corpus"),
        graft.functions.TextSketches.hll_hash(col("g")).as("h")).distinct()
      val bk = corpusBottomK(hashed, K)
      val merged = bk.select("h").distinct()
        .orderBy(uord(col("h"))).limit(K).select(col("h"))
      val bkA = bk.filter(col("corpus") === 0).select("h")
      val bkB = bk.filter(col("corpus") === 1).select("h")
      val num = merged
        .join(bkA, Seq("h"), "left_semi")
        .join(bkB, Seq("h"), "left_semi")
        .agg(count(lit(1)).as("est_num"))
      val mk = merged.agg(count(lit(1)).as("m_k"))
      val sizes = hashed.agg(
        sum(when(col("corpus") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("corpus") === 1, 1L).otherwise(0L)).as("n_b"))
      val exact = hashed.groupBy("h").agg(count(lit(1)).as("c"))
        .agg(sum(when(col("c") === 2, 1L).otherwise(0L)).as("inter"),
          count(lit(1)).as("uni"))
      num.crossJoin(broadcast(mk))
        .crossJoin(broadcast(exact)).crossJoin(broadcast(sizes))
        .select(lit(K).as("k"), col("m_k"), col("est_num"),
          round(col("est_num").cast("double") / col("m_k"), 4).as("j_est"),
          round(col("inter").cast("double") / col("uni"), 4).as("j_exact"),
          col("n_a"), col("n_b"))
    },
    Some(
      s"""WITH RECURSIVE
         |dd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |gr AS (
         |  SELECT doc_id % 2 AS corpus, unnest(list_distinct(list_transform(
         |    range(greatest(len(w) - 2, 1)),
         |    i -> array_to_string(w[i+1:i+3], ' ')))) AS g
         |  FROM dd),
         |gset AS (SELECT DISTINCT g FROM gr),
         |items AS (SELECT g AS doc_id, 0 AS i, g AS t FROM gset),
         |${graft.functions.OracleSql.fnvFold("items")},
         |${graft.functions.OracleSql.fmix64},
         |ch AS (SELECT DISTINCT c.corpus, m.u
         |       FROM gr c JOIN mixed m ON c.g = m.doc_id),
         |bk AS (SELECT corpus, u FROM (
         |         SELECT corpus, u,
         |           row_number() OVER (PARTITION BY corpus ORDER BY u) AS rn
         |         FROM ch) WHERE rn <= $K),
         |merged AS (SELECT u FROM (SELECT DISTINCT u FROM bk)
         |           ORDER BY u LIMIT $K),
         |num AS (SELECT count(*) AS est_num FROM merged
         |        WHERE u IN (SELECT u FROM bk WHERE corpus = 0)
         |          AND u IN (SELECT u FROM bk WHERE corpus = 1)),
         |mk AS (SELECT count(*) AS m_k FROM merged),
         |sizes AS (SELECT
         |    sum(CASE WHEN corpus = 0 THEN 1 ELSE 0 END) AS n_a,
         |    sum(CASE WHEN corpus = 1 THEN 1 ELSE 0 END) AS n_b
         |  FROM ch),
         |ex AS (SELECT
         |    sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS inter,
         |    count(*) AS uni
         |  FROM (SELECT u, count(*) AS c FROM ch GROUP BY 1))
         |SELECT $K AS k, CAST(mk.m_k AS BIGINT) AS m_k,
         |  CAST(num.est_num AS BIGINT) AS est_num,
         |  round(CAST(num.est_num AS DOUBLE) / mk.m_k, 4) AS j_est,
         |  round(CAST(ex.inter AS DOUBLE) / ex.uni, 4) AS j_exact,
         |  CAST(sizes.n_a AS BIGINT) AS n_a, CAST(sizes.n_b AS BIGINT) AS n_b
         |FROM num, mk, sizes, ex""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
