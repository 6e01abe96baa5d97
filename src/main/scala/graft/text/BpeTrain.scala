package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative BPE tokenizer TRAINING (Sennrich et al. 2016) — the full
  * merge loop, where `t_bpe_merge_candidates` is only round 1: each
  * round counts frequency-weighted adjacent symbol pairs over the
  * vocabulary, adopts the most frequent pair as a merge rule
  * (deterministic (count desc, l, r) tie-break), and rewrites the
  * vocabulary with the rule applied. Output = the learned merge table,
  * the artifact a tokenizer ships.
  *
  * Scale shape — the reason BPE training fits Spark at corpus scale:
  * training operates on the DISTINCT-WORD vocabulary weighted by
  * frequency (one corpus pass builds it; Zipf makes it miles smaller
  * than the corpus), so each round is an alphabet-bounded pair
  * aggregate + a TakeOrdered(1) + a broadcast-1-row rewrite map over
  * vocab rows — per-round cost ∝ |vocab|, never corpus. Lineage cut
  * per round, the CC/PageRank loop discipline.
  *
  * Merge application is ONE left-to-right non-overlapping replace pass
  * per round (back-to-back occurrences sharing a separator keep their
  * second occurrence, exactly as both engines' `replace` scans) — that
  * single-pass semantic IS the spec, replayed verbatim by the oracle's
  * chained CTE rounds.
  */
object BpeTrain {

  val Rounds = 10

  private def adjacentPairs(s: Column): Column =
    expr(
      """CASE WHEN size(split(s, ' ')) < 2 THEN array()
        |ELSE transform(sequence(1, size(split(s, ' ')) - 1),
        |  i -> struct(element_at(split(s, ' '), i) AS l,
        |              element_at(split(s, ' '), i + 1) AS r)) END"""
        .stripMargin)

  /** (round, l, r, cnt) — the learned merge table. */
  def train(docs: DataFrame, rounds: Int = Rounds): DataFrame = {
    var vocab = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("s", concat_ws(" ", split(col("word"), "")))
      .localCheckpoint(false)
    val merges = Seq.newBuilder[DataFrame]
    for (k <- 1 to rounds) {
      val pairs = vocab
        .select(col("n"), explode(adjacentPairs(col("s"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
      val best = pairs.orderBy(desc("cnt"), asc("l"), asc("r")).limit(1)
        .select(lit(k).as("round"), col("l"), col("r"), col("cnt"))
        .localCheckpoint(false)
      merges += best
      vocab = vocab
        .crossJoin(broadcast(best.select(col("l"), col("r"))))
        .withColumn("s", trim(expr(
          """replace(concat(' ', s, ' '),
            |        concat(' ', l, ' ', r, ' '),
            |        concat(' ', l, r, ' '))""".stripMargin)))
        .select("word", "n", "s")
        .localCheckpoint(false)
    }
    merges.result().reduce(_.unionByName(_))
  }

  private def oracleSql: String = {
    def pairsFrom(v: String) =
      s"""SELECT p.l, p.r, sum(n) AS cnt FROM (
         |  SELECT n, unnest(list_transform(range(1, len(ws)),
         |    i -> struct_pack(l := ws[i], r := ws[i + 1]))) AS p
         |  FROM (SELECT n, string_split(s, ' ') AS ws FROM $v) t) u
         |GROUP BY 1, 2""".stripMargin
    val rounds = (1 to Rounds).map { k =>
      s"""b$k AS MATERIALIZED (
         |  SELECT $k AS round, l, r, cnt FROM (${pairsFrom(s"v${k - 1}")})
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT word, n,
         |    trim(replace(' ' || s || ' ',
         |      (SELECT ' ' || l || ' ' || r || ' ' FROM b$k),
         |      (SELECT ' ' || l || r || ' ' FROM b$k))) AS s
         |  FROM v${k - 1})""".stripMargin
    }.mkString(",\n")
    val out = (1 to Rounds)
      .map(k => s"SELECT round, l, r, CAST(cnt AS BIGINT) AS cnt FROM b$k")
      .mkString("\nUNION ALL\n")
    s"""WITH v0 AS MATERIALIZED (
       |  SELECT word, count(*) AS n,
       |    array_to_string(string_split(word, ''), ' ') AS s
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word
       |        FROM documents) w
       |  WHERE word <> '' GROUP BY word),
       |$rounds
       |$out""".stripMargin
  }

  private val q = Q(
    "t_bpe_train",
    (s, d) => {
      val docs = Tables(s, d).documents
      // the merge table is a trained artifact: memoize per distinct
      // corpus like every other offline build
      graft.domain.SharedCache.materialiseWith(s,
        graft.domain.SharedCache.defaultRoot, "bpe-train",
        s"bpe-train-v1|${graft.domain.SharedCache.planKey(docs)}|$Rounds")(
        train(docs))
    },
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
