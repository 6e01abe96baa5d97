package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): build the
  * word co-occurrence graph (consecutive content tokens adjacent,
  * undirected, deduplicated) and rank vertices with the SAME
  * integer-unit PageRank recurrence as `d11_pagerank` — graph-centrality
  * keywords need no training data, which is why TextRank remains the
  * stock unsupervised keyword baseline. The reference's keyword surface
  * is tf-idf over surface forms (`ojd_daps/flows/enrich/`,
  * `dom_surface_forms_tfidf`); TextRank is the graph-native complement
  * that rewards CONNECTIVITY rather than rarity.
  *
  * Scale shape: the token-pair explode feeds a distinct on (src, dst) —
  * vocabulary-bounded, not corpus-bounded — and the rank loop inherits
  * [[graft.dedup.PageRank]]'s per-round join+agg shape whose shuffle is
  * |edges| per iteration. Content filter is length > 3 (the synthetic
  * corpus has no stopword list to broadcast; swap the predicate for a
  * broadcast lookup in production, same plan).
  */
object TextRank {

  val TopK = 20

  /** Undirected distinct co-occurrence edges between consecutive
    * content tokens (both longer than 3 chars, not self-loops).
    */
  def wordEdges(docs: DataFrame): DataFrame = {
    val fwd = docs
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(ws) - 1),
          |  i -> struct(element_at(ws, i) AS a,
          |              element_at(ws, i + 1) AS b))""".stripMargin)).as("p"))
      .filter(length(col("p.a")) > 3 && length(col("p.b")) > 3 &&
        col("p.a") =!= col("p.b"))
      .select(col("p.a").as("src"), col("p.b").as("dst"))
    fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  def keywords(docs: DataFrame): DataFrame = {
    val nodes = docs
      .select(explode(split(col("text"), " ")).as("id"))
      .filter(length(col("id")) > 3)
      .distinct()
    graft.dedup.PageRank.run(wordEdges(docs), nodes)
      .orderBy(desc("rank_units"), asc("id"))
      .limit(TopK)
      .select(col("id").as("word"), col("rank_units"))
  }

  private val q = Q(
    "t_textrank_keywords",
    (s, d) => {
      val docs = Tables(s, d).documents
      // memoized like d11: ranks over a static corpus graph build once
      // per distinct input, consumers read the materialised table
      graft.domain.SharedCache.materialiseWith(s,
        graft.domain.SharedCache.defaultRoot, "textrank",
        s"textrank-v1|${graft.domain.SharedCache.planKey(docs)}" +
          s"|${graft.dedup.PageRank.Iterations}|$TopK")(
        keywords(docs))
    },
    Some(
      s"""WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
         |pr0 AS (
         |  SELECT unnest(list_transform(range(1, len(ws)),
         |    i -> struct_pack(a := ws[i], b := ws[i + 1]))) AS p
         |  FROM d),
         |e0 AS (
         |  SELECT p.a AS w1, p.b AS w2 FROM pr0
         |  WHERE len(p.a) > 3 AND len(p.b) > 3 AND p.a <> p.b),
         |edges AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT w1 AS src, w2 AS dst FROM e0
         |    UNION ALL SELECT w2, w1 FROM e0)),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |e AS (SELECT edges.src, edges.dst, deg.outdeg
         |      FROM edges JOIN deg ON edges.src = deg.src),
         |nodes AS (
         |  SELECT DISTINCT w AS id FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
         |  WHERE len(w) > 3),
         |r0 AS (SELECT id, CAST(${graft.dedup.PageRank.BaseUnits} AS BIGINT)
         |         AS rank FROM nodes),
         |${graft.dedup.PageRank.roundsSql}
         |SELECT id AS word, CAST(rank AS BIGINT) AS rank_units
         |FROM r${graft.dedup.PageRank.Iterations}
         |ORDER BY rank DESC, id LIMIT $TopK""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
