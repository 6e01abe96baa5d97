package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** LSH banding recall/precision audit — the dedup subsystem evaluating
  * itself. `d_minhash_lsh_pairs` is exact BECAUSE its candidates are
  * verified; what that query cannot show is how many true pairs the
  * BANDING never surfaced (missed candidates are invisible to a
  * verify-after filter) or how much verify work the buckets waste
  * (precision). This audit computes both against a brute-force exact
  * truth set:
  *
  *     recall    = |candidates ∩ exact| / |exact|
  *     precision = |candidates ∩ exact| / |candidates|
  *
  * in exact ppm integer division. Runs in FNV signature mode with
  * 4-column band keys so the ENTIRE pipeline — shingle fold, 64-slot
  * universal family, banding, bucket join — replays in SQL; the audit
  * is itself hash-checked, not just reported. Production would use the
  * XXH64 signatures; the banding math is identical.
  *
  * The brute truth side is O(n²) BY DESIGN — this is the oracle-ceiling
  * pattern (sim_knn_graph): the audit runs on a sample at corpus scale
  * (recall is a property of the banding parameters, not the corpus
  * size), while the production pairs query stays linear.
  */
object LshAudit {

  private val Threshold = 0.8
  private val P31 = 2147483647L

  private val audit = Q(
    "d24_lsh_recall_audit",
    (s, d) => {
      val sig = MinHashDedup.signatures(Tables(s, d).documents, fnv = true)
        .localCheckpoint(true) // shared by the band melt and both pair sides
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
      val exact = sh.alias("x").join(sh.alias("y"),
          col("x.doc_id") < col("y.doc_id"))
        .filter(size(array_intersect(col("x.sh"), col("y.sh")))
          .cast("double") /
          size(array_union(col("x.sh"), col("y.sh"))) >= Threshold)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      val nHits = cand.join(exact, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("n_hits"))
      nExact.crossJoin(nCand).crossJoin(nHits)
        .select(col("n_exact"), col("n_candidates"), col("n_hits"),
          when(col("n_exact") > 0,
            expr("1000000 * n_hits div n_exact")).as("recall_ppm"),
          when(col("n_candidates") > 0,
            expr("1000000 * n_hits div n_candidates")).as("precision_ppm"))
    },
    Some {
      val fam = (0 until 64).map { j =>
        val a = ((j + 1) * 2654435761L) % P31
        val b = ((j + 1) * 2246822519L) % P31
        s"($j, $a, $b)"
      }.mkString(", ")
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
         |exact AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM shs a JOIN shs b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        len(list_distinct(list_concat(a.sh, b.sh))) >= $Threshold),
         |ne AS (SELECT count(*) AS n_exact FROM exact),
         |nc AS (SELECT count(*) AS n_candidates FROM cand),
         |nh AS (SELECT count(*) AS n_hits
         |       FROM cand JOIN exact USING (doc_a, doc_b))
         |SELECT ne.n_exact, nc.n_candidates, nh.n_hits,
         |  CASE WHEN ne.n_exact > 0
         |       THEN 1000000 * nh.n_hits // ne.n_exact END AS recall_ppm,
         |  CASE WHEN nc.n_candidates > 0
         |       THEN 1000000 * nh.n_hits // nc.n_candidates END
         |    AS precision_ppm
         |FROM ne CROSS JOIN nc CROSS JOIN nh""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(audit)
}
