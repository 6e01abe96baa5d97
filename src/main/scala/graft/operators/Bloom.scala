package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Cross-engine-replayable Bloom filter — the membership sketch beside
  * the replayable HLL (a16b), Count-Min (a23) and histogram quantiles
  * (a24), completing the sketch family: k = 4 hash functions
  * (hll_hash("r:" ++ key), the fnv1a∘fmix64 family), m = 2048 bits, a
  * bit is the DISTINCT set of occupied positions. The filter is
  * OR-mergeable (union of position sets — how per-shard filters combine
  * at 100 TB), and membership is `all k positions set`, with the
  * deterministic false positives collisions produce — which the gate
  * hashes too, because they are a property of the layout, not noise.
  *
  * [[graft.operators.Curation]]'s incremental dedup already uses
  * Spark's native Bloom as a prefilter; this row pins a replayable
  * layout so the sketch itself is portable across engines. Build =
  * one distinct + a position explode over the KEY SET (never the
  * corpus); probing is a broadcast join against ≤ m position rows.
  */
object Bloom {

  val Hashes = 4
  val Bits = 2048L

  private val q = Q(
    "a28_bloom_replayable",
    (s, d) => {
      val t = Tables(s, d)
      val keys = t.supplier.select(col("s_name").as("probe")).distinct()
        .withColumn("expected", lit(true))
      val absent = t.customer.filter(col("c_custkey") <= 500)
        .select(col("c_name").as("probe"))
        .withColumn("expected", lit(false))
      val rp = explode(array((0 until Hashes).map { r =>
        graft.functions.TextSketches
          .hll_hash(concat(lit(s"$r:"), col("probe")))
          .bitwiseAND(lit(Bits - 1))
      }: _*))
      val ppos = keys.union(absent)
        .select(col("probe"), col("expected"), rp.as("pos"))
      val bits = ppos.filter(col("expected")).select("pos").distinct()
      val nb = bits.agg(count(lit(1)).as("n_bits"))
      ppos.alias("p")
        .join(broadcast(bits.alias("b")),
          col("p.pos") === col("b.pos"), "left")
        .groupBy(col("p.probe"), col("p.expected"))
        .agg(sum(when(col("b.pos").isNotNull, 1L).otherwise(0L)).as("hits"))
        .withColumn("is_member", col("hits") === Hashes)
        .crossJoin(broadcast(nb))
    },
    Some(
      s"""WITH RECURSIVE
         |ks AS (SELECT DISTINCT s_name AS probe, true AS expected
         |       FROM supplier
         |       UNION ALL
         |       SELECT c_name, false FROM customer WHERE c_custkey <= 500),
         |items AS (SELECT probe AS doc_id, r AS i,
         |            CAST(r AS VARCHAR) || ':' || probe AS t
         |          FROM ks, range(0, $Hashes) rr(r)),
         |${graft.functions.OracleSql.fnvFold("items")},
         |${graft.functions.OracleSql.fmix64},
         |pp AS (SELECT m.doc_id AS probe, k.expected,
         |         CAST(m.u % $Bits AS BIGINT) AS pos
         |       FROM mixed m JOIN ks k ON m.doc_id = k.probe),
         |bits AS (SELECT DISTINCT pos FROM pp WHERE expected),
         |nb AS (SELECT count(*) AS n_bits FROM bits)
         |SELECT pp.probe, pp.expected,
         |  CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS hits,
         |  CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) = $Hashes AS is_member,
         |  nb.n_bits
         |FROM pp LEFT JOIN bits b ON pp.pos = b.pos CROSS JOIN nb
         |GROUP BY pp.probe, pp.expected, nb.n_bits""".stripMargin),
  )

  // ---- Bloom semi-join reduction --------------------------------------

  /** m for the join-reduction filter (bigger than a28's demo layout:
    * this one is sized for key SETS, not a 25-key probe demo).
    */
  val JoinBits = 65536L

  /** Pack the Bloom filter over `keys` into ONE broadcastable row: a
    * widx → 64-bit-word map (≤ m/64 entries). The build is one distinct
    * + a tiny agg over positions — never over the corpus.
    *
    * Hash family (r08): `xxhash64(key_string, r)` — a native word-wise
    * codegen hash — instead of the former `hll_hash("r:" ++ key)`
    * (per-character fnv1a fold over a fresh concat allocation, ×4 per
    * probed row; opt guide §1.2 per-task work). The family is internal:
    * every consumer's oracle is the PLAIN join (false positives die in
    * the exact join, no false negatives for any deterministic family
    * computed identically on both sides), so the layout is free —
    * unlike a28's replayable sketch above, which keeps the
    * cross-engine fnv1a∘fmix64 family.
    */
  def bloomWordsRow(keys: org.apache.spark.sql.DataFrame,
      keyCol: String): org.apache.spark.sql.DataFrame = {
    val pos = keys.select(col(keyCol).cast("string").as("k")).distinct()
      .select(explode(array((0 until Hashes).map { r =>
        xxhash64(col("k"), lit(r)).bitwiseAND(lit(JoinBits - 1))
      }: _*)).as("pos"))
    pos
      .groupBy(shiftrightunsigned(col("pos"), 6).as("widx"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT)))")
        .as("w"))
      .agg(map_from_entries(collect_list(struct(col("widx"), col("w"))))
        .as("bloom"))
  }

  /** Semi-join reduction: keep only `fact` rows whose `keyCol` passes
    * the Bloom filter built from `dimKeys` — the standard runtime-filter
    * pattern for a fact ⋈ dim join where the dim's key set is too large
    * to broadcast as an exact set (100M keys ≈ 800 MB) but whose Bloom
    * fits in ~2 MB. The check is a pure map over the fact scan (codegen
    * hash + two bit ops per hash function, against a broadcast one-row
    * word map), so the fact-side EXCHANGE shrinks by the join's
    * selectivity before any shuffle happens; false positives are dropped
    * by the exact join that follows, so results are identical to the
    * unfiltered join by construction.
    */
  def bloomPrefilter(fact: org.apache.spark.sql.DataFrame, keyCol: String,
      dimKeys: org.apache.spark.sql.DataFrame,
      dimKeyCol: String): org.apache.spark.sql.DataFrame = {
    // the one-row word map joins on a CONSTANT key rather than a
    // crossJoin: identical broadcast plan in batch, and the same code
    // path then works as a stream-static join (streams cannot
    // crossJoin) — the d_streaming_ivf_assign_parity trick
    val words = bloomWordsRow(dimKeys, dimKeyCol).withColumn("__k", lit(1))
    var f = fact.withColumn("__k", lit(1))
      .join(broadcast(words), Seq("__k")).drop("__k")
    // same xxhash64 family as the build side; the shared string cast is
    // CSE'd inside the one collapsed Project
    (0 until Hashes).foreach { r =>
      f = f.withColumn(s"__bp$r",
        xxhash64(col(keyCol).cast("string"), lit(r))
          .bitwiseAND(lit(JoinBits - 1)))
    }
    val member = (0 until Hashes).map { r =>
      expr(s"""(coalesce(element_at(bloom, shiftrightunsigned(__bp$r, 6)),
           |  CAST(0 AS BIGINT))
           |  & shiftleft(CAST(1 AS BIGINT), CAST(__bp$r & 63 AS INT))) != 0"""
        .stripMargin)
    }.reduce(_ && _)
    f.filter(member)
      .drop("bloom" +: (0 until Hashes).map(r => s"__bp$r"): _*)
  }

  private val j17 = Q(
    "j17_bloom_semijoin",
    (s, d) => {
      val t = Tables(s, d)
      val dim = t.orders
        .filter(col("o_orderpriority") === "1-URGENT" &&
          year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"))
      val survivors = bloomPrefilter(
        t.lineitem.select(col("l_orderkey"), col("l_returnflag"),
          col("l_extendedprice"), col("l_discount")),
        "l_orderkey", dim, "o_orderkey")
      survivors.join(dim, survivors("l_orderkey") === dim("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          graft.util.Stable.dsum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
    },
    // the oracle is the PLAIN join: the Bloom stage must be invisible in
    // the result (no false negatives; false positives die in the exact
    // join) — that invisibility is exactly what the gate checks
    Some(
      s"""SELECT l.l_returnflag, count(*) AS n,
         |  ${graft.util.Stable.dsumSql(
        "l.l_extendedprice * (1 - l.l_discount)")} AS revenue
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_orderpriority = '1-URGENT' AND year(o.o_orderdate) = 1995
         |GROUP BY 1""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q, j17)
}
