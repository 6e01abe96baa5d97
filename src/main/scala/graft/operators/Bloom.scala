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

  def queries: Seq[Q] = Seq(q)
}
