package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Windowed co-occurrence and the inverted index — the two
  * corpus-global text artifacts beside the n-gram LMs: the GloVe-style
  * distance-weighted co-occurrence matrix (embedding training input)
  * and the positional posting lists IR retrieval serves from (the
  * explicit form of what `t_bm25_topk` computes on the fly).
  */
object Cooccurrence {

  /** Skip-gram window: pairs up to [[WindowSize]] positions apart. */
  val WindowSize = 3

  /** Distance weights in SIXTHS so 1/d stays integral: d=1→6, 2→3,
    * 3→2 units (GloVe's 1/d harmonic weighting, exact).
    */
  val WeightUnits: Map[Int, Int] = Map(1 -> 6, 2 -> 3, 3 -> 2)

  /** Keep pairs with at least this much accumulated weight. */
  val MinUnits = 30L

  /** GloVe-style co-occurrence counts (Pennington et al. 2014): ordered
    * token pairs ≤ 3 apart, weighted 1/d in exact sixth-units — the
    * matrix an embedding trainer consumes. Built with ZERO pre-shuffle
    * work: all three distances come from array slices inside the scan
    * (one zip_with per distance, flattened), then one (w1, w2)-keyed
    * map-side-combinable agg. At 100 TB this is the canonical
    * "explode then combine" shape — the pair stream never
    * materialises, only the vocab²-bounded partial maps shuffle.
    */
  private val skipgram = Q(
    "t_skipgram_cooc",
    (s, d) => {
      val words = split(col("text"), " ")
      val pairArrays = (1 to WindowSize).map { dist =>
        zip_with(
          slice(words, lit(1), greatest(size(words) - dist, lit(0))),
          slice(words, lit(1 + dist), greatest(size(words) - dist, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2"),
            lit(WeightUnits(dist)).cast("long").as("u")))
      }
      Tables(s, d).documents
        .select(explode(flatten(array(pairArrays: _*))).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"), col("p.u"))
        .filter(col("w1") =!= "" && col("w2") =!= "")
        .groupBy("w1", "w2")
        .agg(count(lit(1)).as("n_pairs"), sum(col("u")).as("weight_units"))
        .filter(col("weight_units") >= MinUnits)
    },
    Some {
      val perDist = (1 to WindowSize).map { dist =>
        s"""SELECT doc_id,
           |  unnest(list_transform(range(1, len(ws) - ${dist - 1}),
           |    i -> struct_pack(w1 := ws[i], w2 := ws[i + $dist],
           |                     u := ${WeightUnits(dist)}))) AS p
           |FROM w""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |pairs AS (
         |  $perDist)
         |SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS n_pairs,
         |  CAST(sum(p.u) AS BIGINT) AS weight_units
         |FROM pairs
         |WHERE p.w1 <> '' AND p.w2 <> ''
         |GROUP BY 1, 2
         |HAVING CAST(sum(p.u) AS BIGINT) >= $MinUnits""".stripMargin
    },
  )

  /** Posting lists live only for terms attested in ≥ [[MinDf]] docs. */
  val MinDf = 5L

  /** Positional inverted index: (term, doc, occurrence count, sorted
    * 1-based positions, df) — the materialised retrieval artifact.
    * One posexplode + one (term, doc)-keyed agg + a term-keyed df agg
    * joined back; positions sort INSIDE each (term, doc) group (bounded
    * by doc length), never globally. At 100 TB the index would be
    * range-bucketed by term — the same two aggregates.
    */
  private val inverted = Q(
    "t_inverted_index",
    (s, d) => {
      val tp = Tables(s, d).documents
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos0", "term")))
        .filter(col("term") =!= "")
        .select(col("term"), col("doc_id"), (col("pos0") + 1L).as("pos"))
      val postings = tp.groupBy("term", "doc_id")
        .agg(count(lit(1)).as("n_occ"),
          sort_array(collect_list(col("pos"))).as("positions"))
      val df = postings.groupBy("term").agg(count(lit(1)).as("df"))
        .filter(col("df") >= MinDf)
      postings.join(df, "term")
        .select(col("term"), col("doc_id"), col("n_occ"),
          // The driver's pandas canonicaliser cannot hash raw array
          // columns (ADVICE r5) — publish the posting list as a
          // comma-joined string; information content is identical.
          array_join(transform(col("positions"), _.cast("string")), ",")
            .as("positions"),
          col("df"))
    },
    Some(
      s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |tp AS (
         |  SELECT doc_id, p.term AS term, CAST(p.pos AS BIGINT) AS pos
         |  FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(range(1, len(ws) + 1),
         |        i -> struct_pack(term := ws[i], pos := i))) AS p
         |    FROM w)
         |  WHERE p.term <> ''),
         |postings AS (
         |  SELECT term, doc_id, count(*) AS n_occ,
         |    list(pos ORDER BY pos) AS positions
         |  FROM tp GROUP BY 1, 2),
         |df AS (
         |  SELECT term, count(*) AS df FROM postings
         |  GROUP BY 1 HAVING count(*) >= $MinDf)
         |SELECT postings.term, postings.doc_id, postings.n_occ,
         |  array_to_string(postings.positions, ',') AS positions, df.df
         |FROM postings JOIN df ON postings.term = df.term""".stripMargin),
  )

  def queries: Seq[Q] = Seq(skipgram, inverted)
}
