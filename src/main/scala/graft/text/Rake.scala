package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyphrase extraction (Rose et al. 2010) — the stopword-block
  * keyword miner beside `t_textrank_keywords` (graph walk) and
  * `t_tfidf_terms` (corpus weighting): candidate phrases are maximal
  * stopword-free token runs, a word's degree is the summed length of
  * the phrases containing it, and a phrase scores Σ deg(w)/freq(w).
  * All counts are exact integers; the score is a 9-dp-stable sum of
  * |phrase| rationals rounded to 4 (the established log-discipline
  * shape, minus the logs).
  *
  * Shape: posexplode → per-doc run ids (one cumulative window keyed by
  * doc — parallel across docs) → phrase assembly by (doc, run) group →
  * two vocab-bounded word aggregates broadcast back onto the phrase
  * words. Runs longer than [[MaxPhraseLen]] are discarded by contract
  * (they are stopword-starved artifacts, and the cap bounds the
  * assembly group size).
  */
object Rake {

  val MaxPhraseLen = 3
  val TopK = 50

  private val q = Q(
    "t_rake_keyphrases",
    (s, d) => {
      val stop = TextCleaning.Stopwords.toSeq.sorted
      val toks = Tables(s, d).documents
        .select(col("doc_id"),
          posexplode(split(lower(col("text")), "[^a-z]+"))
            .as(Seq("pos", "tok")))
        .filter(col("tok") =!= "")
        .withColumn("is_stop", col("tok").isInCollection(stop))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val runs = toks
        .withColumn("run",
          sum(when(col("is_stop"), 1L).otherwise(0L))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .filter(!col("is_stop"))
      val phrases = runs.groupBy("doc_id", "run")
        .agg(count(lit(1)).as("len"),
          concat_ws(" ", transform(
            sort_array(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok"))).as("phrase"))
        .filter(col("len") <= MaxPhraseLen)
      val words = phrases
        .select(col("len"), explode(split(col("phrase"), " ")).as("w"))
      val stats = words.groupBy("w")
        .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      val scored = phrases
        .select(col("phrase"), explode(split(col("phrase"), " ")).as("w"))
        .join(broadcast(stats), "w")
        .groupBy("phrase")
        .agg(count(lit(1)).as("n_word_slots"),
          graft.util.Stable.dsum(
            col("deg").cast("double") / col("freq").cast("double"), 9)
            .as("raw"))
      // one phrase string may occur in many docs: score counts every
      // occurrence's word slots (classic corpus RAKE), rank and cut
      scored
        .select(col("phrase"), col("n_word_slots"),
          round(col("raw"), 4).as("score"))
        .orderBy(desc("score"), asc("phrase"))
        .limit(TopK)
    },
    Some {
      val stop = TextCleaning.Stopwords.toSeq.sorted
        .map(t => "'" + t.replace("'", "''") + "'").mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, p.pos AS pos, p.tok AS tok,
         |    p.tok IN ($stop) AS is_stop
         |  FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(
         |        string_split_regex(lower(text), '[^a-z]+'),
         |        (t, i) -> struct_pack(pos := i, tok := t))) AS p
         |    FROM documents)
         |  WHERE p.tok <> ''),
         |runs0 AS (
         |  -- the run id window must see the STOP rows; a WHERE here
         |  -- would filter before the window computes
         |  SELECT doc_id, pos, tok, is_stop,
         |    sum(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
         |  FROM toks),
         |runs AS (
         |  SELECT doc_id, pos, tok, run FROM runs0 WHERE NOT is_stop),
         |phrases AS (
         |  SELECT doc_id, run, count(*) AS len,
         |    string_agg(tok, ' ' ORDER BY pos) AS phrase
         |  FROM runs GROUP BY 1, 2
         |  HAVING count(*) <= $MaxPhraseLen),
         |words AS (
         |  SELECT len, unnest(string_split(phrase, ' ')) AS w
         |  FROM phrases),
         |stats AS (
         |  SELECT w, count(*) AS freq, CAST(sum(len) AS BIGINT) AS deg
         |  FROM words GROUP BY 1),
         |pw AS (
         |  SELECT phrase, unnest(string_split(phrase, ' ')) AS w
         |  FROM phrases),
         |scored AS (
         |  SELECT pw.phrase, count(*) AS n_word_slots,
         |    ${graft.util.Stable.dsumSql(
              "CAST(stats.deg AS DOUBLE) / CAST(stats.freq AS DOUBLE)", 9)}
         |      AS raw
         |  FROM pw JOIN stats ON pw.w = stats.w
         |  GROUP BY 1)
         |SELECT phrase, n_word_slots, round(raw, 4) AS score
         |FROM scored
         |ORDER BY score DESC, phrase ASC
         |LIMIT $TopK""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
