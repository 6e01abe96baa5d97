package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every k-gram, slide a
  * window of [[W]] consecutive positions, keep each window's MINIMUM
  * hash; the distinct kept hashes are the document's fingerprint set.
  * The guarantee that makes it the standard plagiarism/overlap
  * detector: any shared run of at least k+W−1 tokens between two
  * documents yields at least one shared fingerprint, while storage is
  * ~2/(W+1) of the gram count — a principled sparse fingerprint,
  * unlike the single whole-doc hashes (`t_fingerprint_md5/rolling`)
  * that only catch exact duplicates.
  *
  * Scale: gram construction is per-row array algebra, hashing is the
  * codegen fnv1a∘fmix64 map, and the window min runs per document
  * ordered by position — doc-keyed exchange only, nothing global,
  * nothing pairwise (pairing happens downstream by equi-join on `fp`,
  * the same inverted-index shape as the containment join). Hashes are
  * masked to 63 bits so the signed JVM ordering and the oracle's
  * unsigned ordering agree on min.
  */
object Winnowing {

  val K = 3
  val W = 4

  private val q = Q(
    "t_winnowing_fingerprints",
    (s, d) => {
      // grams via lead windows over the token stream instead of a
      // per-row array transform: the string assembly and the hash stay
      // inside whole-stage codegen, and the lead/min windows share one
      // doc-keyed exchange+sort (same partitioning, same order)
      val byPos = Window.partitionBy("doc_id").orderBy("p")
      Tables(s, d).documents
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("p", "w")))
        .withColumn("w1", lead("w", 1).over(byPos))
        .withColumn("w2", lead("w", 2).over(byPos))
        .filter(col("w2").isNotNull)
        .withColumn("h",
          graft.functions.TextSketches.hll_hash(
            concat_ws(" ", col("w"), col("w1"), col("w2")))
            .bitwiseAND(lit(Long.MaxValue)))
        .withColumn("fp", min("h").over(byPos.rowsBetween(0, W - 1)))
        // keep only FULL windows: the row W-1 gram-positions ahead exists
        .withColumn("full", lead("h", W - 1).over(byPos))
        .filter(col("full").isNotNull)
        .select("doc_id", "fp").distinct()
    },
    Some(
      s"""WITH RECURSIVE
         |dd AS (SELECT doc_id, string_split(text, ' ') AS w
         |       FROM documents),
         |gr AS (
         |  SELECT doc_id, p, array_to_string(w[p+1:p+$K], ' ') AS g,
         |    len(w) - ${K - 1} AS ng
         |  FROM (SELECT doc_id, w,
         |          unnest(range(greatest(len(w) - ${K - 1}, 0))) AS p
         |        FROM dd)),
         |vocab AS (SELECT DISTINCT g FROM gr),
         |items AS (SELECT g AS doc_id, 0 AS i, g AS t FROM vocab),
         |${graft.functions.OracleSql.fnvFold("items")},
         |${graft.functions.OracleSql.fmix64},
         |hh AS (SELECT doc_id AS g,
         |         CAST(u % CAST('9223372036854775808' AS HUGEINT)
         |           AS BIGINT) AS h
         |       FROM mixed),
         |wm AS (
         |  SELECT gr.doc_id, gr.p, gr.ng,
         |    min(hh.h) OVER (PARTITION BY gr.doc_id ORDER BY gr.p
         |      ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS fp
         |  FROM gr JOIN hh USING (g))
         |SELECT DISTINCT doc_id, fp FROM wm WHERE p <= ng - $W"""
        .stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
