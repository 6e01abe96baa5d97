package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WordPiece encoding (Wu et al. 2016; the BERT tokenizer) — the
  * greedy longest-match-first algorithm, the OTHER canonical subword
  * tokenizer beside the merge-driven BPE (`t_bpe_encode`): a word is
  * consumed left to right, each step taking the LONGEST vocabulary
  * piece that matches at the cursor, with separate initial
  * (word-start) and continuation ("##") piece tables.
  *
  * Vocabulary is corpus-derived and deterministic: the top
  * [[VocabK]] initial pieces (word prefixes, length 2..[[MaxPiece]])
  * and top [[VocabK]] continuation pieces (interior substrings) by
  * occurrence-weighted count with (count desc, piece asc) tiebreak,
  * plus EVERY single character in both roles — which makes encoding
  * total (no UNK path) by construction.
  *
  * Scale shape — the `t_bpe_encode` contract: everything is keyed by
  * DISTINCT word, so corpus size enters only through the one token
  * count; the candidate↔vocab match is an EQUI join on the piece
  * string (substring expansion on the small distinct-word frame, never
  * regex, never cross); and the greedy walk advances all words one
  * cursor step per round off a precomputed per-(word, offset)
  * transition table — max-word-length rounds of joins on the
  * distinct-word frame, lineage cut periodically. The DuckDB oracle
  * replays the walk as a recursive CTE over the SAME transition table.
  *
  * Output: the fertility histogram (pieces-per-word → distinct words,
  * occurrence-weighted words) — the number a tokenizer is judged by.
  */
object WordPiece {

  val VocabK = 40
  val MaxPiece = 6
  val MaxWordLen = 24 // words truncate here; bounds the walk round count

  /** (w, cnt) distinct words with occurrence counts, truncated. */
  private def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w0"))
      .filter(length(col("w0")) > 0)
      .select(substring(col("w0"), 1, MaxWordLen).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** (role, piece) vocabulary; role 0 = initial, 1 = continuation. */
  private def vocab(words: DataFrame): DataFrame = {
    // all substrings (offset p, length L) of each word, both roles,
    // occurrence-weighted
    val subs = words.select(col("w"), col("cnt"),
      explode(expr(
        s"""flatten(transform(sequence(0, length(w) - 1), p ->
           |  transform(sequence(2, least(${MaxPiece}, length(w) - p)),
           |    L -> struct(p, substring(w, p + 1, L) AS piece))))"""
          .stripMargin)).as("s"))
      .filter(length(col("s.piece")) >= 2)
      .select(when(col("s.p") === 0, 0).otherwise(1).as("role"),
        col("s.piece"), col("cnt"))
    val counted = subs.groupBy("role", "piece")
      .agg(sum(col("cnt")).as("n"))
    val wTop = Window.partitionBy("role")
      .orderBy(desc("n"), asc("piece"))
    val top = counted.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= VocabK).select("role", "piece")
    // every single character, both roles — totality
    val chars = words
      .select(explode(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("piece"))
      .distinct()
    top.unionByName(
      chars.select(lit(0).as("role"), col("piece"))
        .unionByName(chars.select(lit(1).as("role"), col("piece"))))
      .distinct()
  }

  /** (w, p, step): at cursor p (0-based), the longest vocab match. */
  private def transitions(words: DataFrame, voc: DataFrame): DataFrame = {
    val cands = words.select(col("w"),
      explode(expr(
        s"""flatten(transform(sequence(0, length(w) - 1), p ->
           |  transform(sequence(1, least(${MaxPiece}, length(w) - p)),
           |    L -> struct(p, L, substring(w, p + 1, L) AS piece))))"""
          .stripMargin)).as("s"))
      .select(col("w"), col("s.p").as("p"), col("s.L").as("L"),
        when(col("s.p") === 0, 0).otherwise(1).as("role"),
        col("s.piece").as("piece"))
    cands.join(voc, Seq("role", "piece"))
      .groupBy("w", "p").agg(max(col("L")).as("step"))
  }

  /** Pieces-per-word for every distinct word: the greedy walk. */
  def encode(docs: DataFrame)(implicit s: SparkSession): DataFrame = {
    val words = wordCounts(docs).localCheckpoint(true)
    val trans = transitions(words, vocab(words)).localCheckpoint(true)
    // coalesce: max over ZERO words is null and `.getInt` would NPE — an
    // empty corpus must encode to an empty result, not crash. The clamp
    // to MaxWordLen is defensive: wordCounts already truncates, so the
    // walk can never need more rounds than that, whatever the input.
    val maxLen = math.min(MaxWordLen,
      words.agg(coalesce(max(length(col("w"))), lit(0))).head().getInt(0))
    var state = words.select(col("w"), col("cnt"),
      lit(0).as("cur"), lit(0).as("n_pieces"))
    for (i <- 1 to maxLen) {
      val open = state.filter(col("cur") < length(col("w")))
      val closed = state.filter(col("cur") >= length(col("w")))
      val advanced = open
        .join(trans, open("w") === trans("w") && col("cur") === col("p"))
        .select(open("w"), col("cnt"),
          (col("cur") + col("step")).as("cur"),
          (col("n_pieces") + 1).as("n_pieces"))
      state = advanced.unionByName(closed)
      if (i % 6 == 0) state = state.localCheckpoint(true)
    }
    state.select(col("w"), col("cnt"), col("n_pieces"))
  }

  private val q = Q(
    "t_wordpiece_fertility",
    (s, d) => {
      implicit val sp: SparkSession = s
      encode(Tables(s, d).documents)
        .groupBy("n_pieces")
        .agg(count(lit(1)).as("n_distinct_words"),
          sum(col("cnt")).as("n_word_occurrences"))
    },
    Some(
      s"""WITH RECURSIVE
         |wc AS (
         |  SELECT substring(t, 1, $MaxWordLen) AS w, count(*) AS cnt
         |  FROM (SELECT unnest(string_split(text, ' ')) AS t
         |        FROM documents)
         |  WHERE length(t) > 0 GROUP BY 1),
         |subs AS (
         |  SELECT CASE WHEN p = 0 THEN 0 ELSE 1 END AS role,
         |    substring(w, p + 1, L) AS piece, cnt
         |  FROM wc,
         |    LATERAL (SELECT unnest(range(length(w))) AS p),
         |    LATERAL (SELECT unnest(range(2, least($MaxPiece,
         |      length(w) - p) + 1)) AS L)),
         |counted AS (
         |  SELECT role, piece, sum(cnt) AS n FROM subs GROUP BY 1, 2),
         |top AS (
         |  SELECT role, piece FROM (
         |    SELECT role, piece,
         |      row_number() OVER (PARTITION BY role
         |        ORDER BY n DESC, piece ASC) AS rk
         |    FROM counted) WHERE rk <= $VocabK),
         |chars AS (
         |  SELECT DISTINCT substring(w, i + 1, 1) AS piece
         |  FROM wc, LATERAL (SELECT unnest(range(length(w))) AS i)),
         |voc AS (
         |  SELECT DISTINCT * FROM (
         |    SELECT role, piece FROM top
         |    UNION ALL SELECT 0, piece FROM chars
         |    UNION ALL SELECT 1, piece FROM chars)),
         |cands AS (
         |  SELECT w, p, L,
         |    CASE WHEN p = 0 THEN 0 ELSE 1 END AS role,
         |    substring(w, p + 1, L) AS piece
         |  FROM wc,
         |    LATERAL (SELECT unnest(range(length(w))) AS p),
         |    LATERAL (SELECT unnest(range(1, least($MaxPiece,
         |      length(w) - p) + 1)) AS L)),
         |trans AS (
         |  SELECT c.w, c.p, max(c.L) AS step
         |  FROM cands c JOIN voc ON c.role = voc.role
         |    AND c.piece = voc.piece
         |  GROUP BY 1, 2),
         |walk(w, cur, n_pieces) AS (
         |  SELECT w, 0, 0 FROM wc
         |  UNION ALL
         |  SELECT walk.w, walk.cur + t.step, walk.n_pieces + 1
         |  FROM walk JOIN trans t ON walk.w = t.w AND walk.cur = t.p),
         |encoded AS (
         |  SELECT w, n_pieces FROM walk
         |  WHERE cur = length(w))
         |SELECT e.n_pieces, count(*) AS n_distinct_words,
         |  CAST(sum(wc.cnt) AS BIGINT) AS n_word_occurrences
         |FROM encoded e JOIN wc ON e.w = wc.w
         |GROUP BY e.n_pieces""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
