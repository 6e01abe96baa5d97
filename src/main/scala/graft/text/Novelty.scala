package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document n-gram novelty — the redundancy-growth curve of a
  * corpus in ingestion order: for each doc, the fraction of its
  * distinct trigrams whose FIRST occurrence (min doc_id) is this doc.
  * Falling novelty over the id axis is the diminishing-returns signal
  * data-scaling work watches (new crawls adding mostly old n-grams),
  * and per-doc novelty near 0 flags boilerplate the pairwise dedup
  * family may miss (a doc assembled entirely from common fragments has
  * no single near-duplicate).
  *
  * Scale: one gram-keyed min aggregate (map-side combinable) + one
  * doc-keyed count — both linear; gram strings shuffle only for oracle
  * parity, the fleet path runs the same plan on 8-byte gram hashes.
  */
object Novelty {

  def novelty(docs: DataFrame): DataFrame = {
    val inv = docs.select(col("doc_id"),
      explode(array_distinct(
        graft.dedup.MinHashDedup.shingles(col("text"), 3))).as("g"))
    val firsts = inv.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    inv.join(firsts, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams"), 4))
  }

  private val q = Q(
    "t_ngram_novelty",
    (s, d) => novelty(Tables(s, d).documents),
    Some(
      """WITH g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
        |      i -> concat_ws(' ', string_split(text,' ')[i],
        |                          string_split(text,' ')[i+1],
        |                          string_split(text,' ')[i+2]))) AS grams
        |  FROM documents),
        |inv AS (SELECT doc_id, unnest(grams) AS gr FROM g),
        |firsts AS (SELECT gr, min(doc_id) AS first_doc FROM inv GROUP BY 1)
        |SELECT inv.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN firsts.first_doc = inv.doc_id
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(CAST(sum(CASE WHEN firsts.first_doc = inv.doc_id
        |                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
        |    AS novelty
        |FROM inv JOIN firsts USING (gr)
        |GROUP BY 1""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
