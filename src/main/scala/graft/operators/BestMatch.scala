package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Best-match join (top-1 per probe) — the entity-resolution delivery
  * shape on top of the all-pairs fuzzy join: j13/j15 emit EVERY
  * qualifying pair (the clustering input); a reviewer UI or survivorship
  * step instead wants each record's single closest other record. One
  * argmin per probe over the banded candidates: min distance, ties to
  * the smaller partner key — deterministic, and Spark plans the rank-1
  * filter as WindowGroupLimit, so the full candidate ranking never
  * materialises.
  *
  * Scale shape: inherits j13's entire cost model (noun blocking,
  * salting, distinct-name verify, q-gram + length prefilters); the
  * argmin adds ONE key-partitioned window over the verified-pair set,
  * whose size is the result volume, not the corpus.
  */
object BestMatch {

  private val q = Q(
    "j21_best_match_join",
    (s, d) => {
      val pairs = Extended.fuzzyPairsCached(Tables(s, d).part)
      // symmetrize: each verified pair serves both endpoints as probes
      val sym = pairs.select(col("key_a").as("key"),
          col("key_b").as("match_key"), col("dist"))
        .union(pairs.select(col("key_b").as("key"),
          col("key_a").as("match_key"), col("dist")))
      val w = Window.partitionBy("key")
        .orderBy(asc("dist"), asc("match_key"))
      sym.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("key"), col("match_key"), col("dist"))
    },
    Some(
      """WITH pairs AS (
        |  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        |    CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |  FROM part a JOIN part b
        |    ON string_split(a.p_name, ' ')[-1] =
        |       string_split(b.p_name, ' ')[-1]
        |   AND a.p_partkey < b.p_partkey
        |  WHERE levenshtein(a.p_name, b.p_name) <= 3),
        |sym AS (
        |  SELECT key_a AS key, key_b AS match_key, dist FROM pairs
        |  UNION ALL
        |  SELECT key_b, key_a, dist FROM pairs),
        |ranked AS (
        |  SELECT key, match_key, dist,
        |    row_number() OVER (PARTITION BY key
        |                       ORDER BY dist ASC, match_key ASC) AS rn
        |  FROM sym)
        |SELECT key, match_key, dist FROM ranked WHERE rn = 1"""
        .stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
