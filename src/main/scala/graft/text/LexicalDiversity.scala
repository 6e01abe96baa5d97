package graft.text

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._

/** Lexical-diversity scoring — the vocabulary-richness axis of corpus
  * quality, complementing `t_quality_score` (length/punct ratios) and
  * `t_char_entropy` (character distribution): template-generated or
  * keyword-stuffed text shows normal length and entropy but a collapsed
  * type/token ratio, which is why diversity features sit in most
  * published quality-filter stacks.
  *
  * Two measures per document:
  *   - `ttr`   = |distinct tokens| / |tokens| — cheap but length-biased
  *     (long documents repeat function words, so raw TTR decays with
  *     length);
  *   - `msttr` = mean TTR over consecutive non-overlapping 50-token
  *     segments, FULL segments only (Johnson's Mean Segmental TTR) —
  *     the standard length-debiased variant: every document is scored
  *     on equal-sized windows, so scores compare across lengths.
  *
  * Tokenization is the engine-wide `split(text, ' ')` convention
  * (OracleSql.tokenItems), so diversity scores are consistent with the
  * token counts the packing/batching operators use.
  *
  * Shape: one posexplode + two token-keyed aggregations that share the
  * doc_id shuffle; the segment TTRs go through the decimal-stable mean
  * so partial-agg order cannot move the published score. Documents
  * shorter than one full segment publish NULL msttr rather than a
  * biased partial-window score.
  */
object LexicalDiversity {

  val SegmentTokens = 50

  private val ttr = Q(
    "t_lexical_diversity",
    (s, d) => {
      val tok = Tables(s, d).documents
        .select(col("doc_id"), posexplode(split(col("text"), " "))
          .as(Seq("i", "t")))
      val base = tok.groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("t")).as("n_types"))
      val seg = tok
        .groupBy(col("doc_id"), expr(s"i div $SegmentTokens").as("s"))
        .agg(count(lit(1)).as("c"), countDistinct(col("t")).as("dt"))
        .filter(col("c") === SegmentTokens)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_segments"),
          Stable.davg(col("dt").cast("double") / lit(SegmentTokens.toDouble),
            9).as("msttr"))
      base.join(seg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          (col("n_types").cast("double") / col("n_tokens").cast("double"))
            .as("ttr"),
          col("n_segments"), col("msttr"))
    },
    Some(
      s"""WITH ${graft.functions.OracleSql.tokenItems("documents")},
         |base AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    count(DISTINCT t) AS n_types
         |  FROM tok GROUP BY 1),
         |segs AS (
         |  SELECT doc_id, i // $SegmentTokens AS s, count(*) AS c,
         |    count(DISTINCT t) AS dt
         |  FROM tok GROUP BY 1, 2),
         |m AS (
         |  SELECT doc_id, count(*) AS n_segments,
         |    ${Stable.davgSql(s"CAST(dt AS DOUBLE) / ${SegmentTokens.toDouble}", 9)}
         |      AS msttr
         |  FROM segs WHERE c = $SegmentTokens GROUP BY 1)
         |SELECT b.doc_id, b.n_tokens, b.n_types,
         |  CAST(b.n_types AS DOUBLE) / CAST(b.n_tokens AS DOUBLE) AS ttr,
         |  m.n_segments, m.msttr
         |FROM base b LEFT JOIN m USING (doc_id)""".stripMargin),
  )

  def queries: Seq[Q] = Seq(ttr)
}
