package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** LSH operating-curve sweep — d24 audits ONE threshold; choosing
  * the banding scheme needs the whole precision/recall CURVE, and
  * the curve costs no more than one point: the exact-Jaccard pair
  * table and the candidate set are built ONCE, every threshold is a
  * conditional aggregate over the same pass (5-row threshold spine
  * broadcast into the pair stream). Jaccard stays an exact integer
  * ppm ratio, so threshold comparisons are BIGINT, not float.
  *
  * Scale note: the exact pair join is the oracle-ceiling pattern
  * (d24's framing) — run on a SAMPLE at fleet scale; the sweep logic
  * itself is threshold-count × one pass, independent of corpus size.
  */
object LshSweep {

  private val ThresholdsPpm = Seq(500000L, 600000L, 700000L, 800000L,
    900000L)
  private val P31 = 2147483647L

  private val q = Q(
    "d24b_lsh_threshold_sweep",
    (s, d) => {
      val sig = MinHashDedup.signatures(Tables(s, d).documents, fnv = true)
        .localCheckpoint(true)
      val bandStructs = (0 until 16).map { b =>
        struct(lit(b).as("band"),
          col(s"m${4 * b}").as("k0"), col(s"m${4 * b + 1}").as("k1"),
          col(s"m${4 * b + 2}").as("k2"), col(s"m${4 * b + 3}").as("k3"))
      }
      val buckets = sig
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.k0"),
          col("bk.k1"), col("bk.k2"), col("bk.k3"))
      val cand = buckets.alias("a").join(buckets.alias("b"),
          Seq("band", "k0", "k1", "k2", "k3"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val sh = sig.select(col("doc_id"), col("sh"))
      val pairs = sh.alias("x").join(sh.alias("y"),
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          (lit(1000000L) * size(array_intersect(col("x.sh"), col("y.sh")))
            .cast("long")).as("inter6"),
          size(array_union(col("x.sh"), col("y.sh"))).cast("long")
            .as("uni"))
        .select(col("doc_a"), col("doc_b"),
          expr("inter6 div uni").as("jac_ppm"))
      val flagged = pairs
        .join(cand.withColumn("is_cand", lit(1L)), Seq("doc_a", "doc_b"),
          "left")
        .select(col("jac_ppm"), coalesce(col("is_cand"), lit(0L))
          .as("is_cand"))
        .localCheckpoint(false)
      import s.implicits._
      val thr = ThresholdsPpm.toDF("t_ppm")
      val nCand = flagged.agg(sum(col("is_cand")).as("n_candidates"))
      flagged.crossJoin(broadcast(thr))
        .filter(col("jac_ppm") >= col("t_ppm"))
        .groupBy("t_ppm")
        .agg(count(lit(1)).as("n_exact"), sum(col("is_cand")).as("n_hits"))
        .crossJoin(broadcast(nCand))
        .select(col("t_ppm"), col("n_exact"), col("n_hits"),
          col("n_candidates"),
          expr("1000000 * n_hits div n_exact").as("recall_ppm"),
          expr("1000000 * n_hits div n_candidates").as("precision_ppm"))
    },
    Some {
      val fam = (0 until 64).map { j =>
        val a = ((j + 1) * 2654435761L) % P31
        val b = ((j + 1) * 2246822519L) % P31
        s"($j, $a, $b)"
      }.mkString(", ")
      val thrRows = ThresholdsPpm.map(t => s"($t)").mkString(", ")
      s"""WITH RECURSIVE
         |${graft.functions.OracleSql.shingleItems("documents")},
         |${graft.functions.OracleSql.fnvFold("sg")},
         |hh AS (SELECT doc_id, CAST(h % $P31 AS BIGINT) AS h FROM done),
         |fam(j, a, b) AS (VALUES $fam),
         |slots AS (
         |  SELECT hh.doc_id, fam.j,
         |    min((fam.a * hh.h + fam.b) % $P31) AS m
         |  FROM hh CROSS JOIN fam GROUP BY 1, 2),
         |bands AS (
         |  SELECT doc_id, j // 4 AS band,
         |    min(CASE WHEN j % 4 = 0 THEN m END) AS k0,
         |    min(CASE WHEN j % 4 = 1 THEN m END) AS k1,
         |    min(CASE WHEN j % 4 = 2 THEN m END) AS k2,
         |    min(CASE WHEN j % 4 = 3 THEN m END) AS k3
         |  FROM slots GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
         |   AND a.k2 = b.k2 AND a.k3 = b.k3 AND a.doc_id < b.doc_id),
         |shs AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(
         |      range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
         |      i -> concat_ws(' ', string_split(text,' ')[i],
         |                          string_split(text,' ')[i+1],
         |                          string_split(text,' ')[i+2]))) AS sh
         |  FROM documents),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    (1000000 * CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT))
         |      // CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT)
         |      AS jac_ppm
         |  FROM shs a JOIN shs b ON a.doc_id < b.doc_id),
         |flagged AS (
         |  SELECT p.jac_ppm,
         |    CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END AS is_cand
         |  FROM pairs p LEFT JOIN cand c USING (doc_a, doc_b)),
         |nc AS (SELECT CAST(sum(is_cand) AS BIGINT) AS n_candidates
         |       FROM flagged),
         |thr(t_ppm) AS (VALUES $thrRows)
         |SELECT t_ppm, count(*) AS n_exact,
         |  CAST(sum(is_cand) AS BIGINT) AS n_hits, nc.n_candidates,
         |  1000000 * CAST(sum(is_cand) AS BIGINT) // count(*) AS recall_ppm,
         |  1000000 * CAST(sum(is_cand) AS BIGINT) // nc.n_candidates
         |    AS precision_ppm
         |FROM flagged CROSS JOIN thr CROSS JOIN nc
         |WHERE jac_ppm >= t_ppm
         |GROUP BY t_ppm, nc.n_candidates""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
