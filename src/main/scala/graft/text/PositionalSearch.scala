package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Positional phrase search — the query-time half of
  * `t_inverted_index`: a phrase "w1 w2" matches where the two posting
  * lists intersect on a document with position delta exactly 1, the
  * way every IR engine evaluates quoted queries. The probe phrase is
  * self-derived (the corpus' most frequent bigram, lexicographic
  * tie-break) so the fixture stays deterministic at any sf.
  *
  * Shape: one positional self-join on (doc, pos+1) for the bigram
  * stats, a 1-row TakeOrdered argmax broadcast back, then the SAME
  * join shape filtered to the probe — at serving scale the second
  * join is two posting-list lookups, not a scan (the inverted index
  * row shows the artifact; this row shows the algebra).
  */
object PositionalSearch {

  private val q = Q(
    "t_positional_search",
    (s, d) => {
      val tp = Tables(s, d).documents
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
        .filter(col("term") =!= "")
      val a = tp.select(col("doc_id"), col("pos"), col("term").as("w1"))
      val b = tp.select(col("doc_id"), (col("pos") - 1).as("pos"),
        col("term").as("w2"))
      val pairs = a.join(b, Seq("doc_id", "pos"))
      val top = pairs.groupBy("w1", "w2")
        .agg(count(lit(1)).as("n_total"))
        .orderBy(desc("n_total"), asc("w1"), asc("w2"))
        .limit(1)
      pairs.join(broadcast(top), Seq("w1", "w2"))
        .groupBy("w1", "w2", "n_total")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .select(col("w1"), col("w2"), col("n_total"), col("n_docs"))
    },
    Some(
      """WITH tp AS (
        |  SELECT doc_id, p.pos AS pos, p.tok AS term
        |  FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(string_split(text, ' '),
        |        (t, i) -> struct_pack(pos := i, tok := t))) AS p
        |    FROM documents)
        |  WHERE p.tok <> ''),
        |pairs AS (
        |  SELECT a.doc_id, a.term AS w1, b.term AS w2
        |  FROM tp a JOIN tp b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |top AS (
        |  SELECT w1, w2, count(*) AS n_total
        |  FROM pairs GROUP BY 1, 2
        |  ORDER BY n_total DESC, w1 ASC, w2 ASC LIMIT 1)
        |SELECT top.w1, top.w2, top.n_total,
        |  CAST(count(DISTINCT pairs.doc_id) AS BIGINT) AS n_docs
        |FROM pairs JOIN top ON pairs.w1 = top.w1 AND pairs.w2 = top.w2
        |GROUP BY 1, 2, 3""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
