package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** HLL set algebra — the sketch composition a16b's registers exist
  * for: given two user sets as register tables (customers with
  * URGENT orders, customers with HIGH orders), the UNION estimate is
  * free (MAX-merge the registers — the a26 mergeability property
  * across SETS instead of shards) and the INTERSECTION comes by
  * inclusion–exclusion |A∩B| ≈ |A|+|B|−|A∪B| (clamped at 0 — I–E on
  * sketches can go negative), giving an estimated Jaccard without
  * ever joining the sets. At 100 TB this answers audience-overlap
  * questions from KB-sized sketches instead of corpus-sized joins.
  *
  * Every piece is the a16b integer machinery (fnv1a∘fmix64 hash, 512
  * registers, integer-division estimate), so the whole thing —
  * registers, estimates, I–E — replays exactly in SQL. Exact counts
  * ride along as the audit columns.
  *
  * Shape: one distinct-key agg, one map stage for hashes, register
  * aggs on 512·3 rows. One scan of orders.
  */
object HllSetOps {

  private val q = Q(
    "a97_hll_set_ops",
    (s, d) => {
      val o = Tables(s, d).orders
      val flags = o.groupBy("o_custkey")
        .agg(max(when(col("o_orderpriority") === "1-URGENT", 1)
          .otherwise(0)).as("in_a"),
          max(when(col("o_orderpriority") === "2-HIGH", 1)
            .otherwise(0)).as("in_b"))
        .filter(col("in_a") === 1 || col("in_b") === 1)
        .localCheckpoint(false)
      val sets =
        flags.filter(col("in_a") === 1).select(lit("a").as("s"),
          col("o_custkey")).unionAll(
          flags.filter(col("in_b") === 1).select(lit("b").as("s"),
            col("o_custkey"))).unionAll(
          flags.select(lit("u").as("s"), col("o_custkey")))
      val regs = Hll.bucketRho(sets, Seq("s"), col("o_custkey"))
        .groupBy("s", "bucket").agg(max(col("rho")).as("m"))
      // small-range correction (w13's linear-counting branch): at sf0.001
      // the sets sit far below 2.5·m, where raw HLL is biased high
      val est = Hll.estimate2(regs, Seq("s"))
        .select(col("s"),
          when(col("approx") <= lit(2.5 * Hll.M) &&
            (lit(Hll.M.toLong) - col("seen")) > 0,
            round(lit(Hll.M) * log(lit(Hll.M.toDouble) /
              (lit(Hll.M.toLong) - col("seen")).cast("double")), 4))
            .otherwise(col("approx")).as("approx"))
      val wide = est.groupBy()
        .agg(max(when(col("s") === "a", col("approx"))).as("ea"),
          max(when(col("s") === "b", col("approx"))).as("eb"),
          max(when(col("s") === "u", col("approx"))).as("eu"))
      val exact = flags.agg(
        sum(col("in_a")).as("exact_a"), sum(col("in_b")).as("exact_b"),
        count(lit(1)).as("exact_union"),
        sum(col("in_a") * col("in_b")).as("exact_inter"))
      wide.crossJoin(broadcast(exact))
        .select(
          round(col("ea"), 4).as("approx_a"),
          round(col("eb"), 4).as("approx_b"),
          round(col("eu"), 4).as("approx_union"),
          round(greatest(lit(0.0), col("ea") + col("eb") - col("eu")), 4)
            .as("approx_inter"),
          round(greatest(lit(0.0), col("ea") + col("eb") - col("eu")) /
            col("eu"), 6).as("approx_jaccard"),
          col("exact_a"), col("exact_b"), col("exact_union"),
          col("exact_inter"))
    },
    Some(
      s"""WITH RECURSIVE
         |flags AS (
         |  SELECT o_custkey,
         |    max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
         |      AS in_a,
         |    max(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
         |      AS in_b
         |  FROM orders GROUP BY 1),
         |members AS (SELECT * FROM flags WHERE in_a = 1 OR in_b = 1),
         |items AS (SELECT o_custkey AS doc_id, 0 AS i,
         |            CAST(o_custkey AS VARCHAR) AS t FROM members),
         |${graft.functions.OracleSql.fnvFold("items")},
         |${graft.functions.OracleSql.fmix64},
         |sets AS (
         |  SELECT 'a' AS s, o_custkey FROM members WHERE in_a = 1
         |  UNION ALL SELECT 'b', o_custkey FROM members WHERE in_b = 1
         |  UNION ALL SELECT 'u', o_custkey FROM members),
         |hw AS (
         |  SELECT st.s, m.u % 512 AS bucket, m.u // 512 AS w
         |  FROM sets st JOIN mixed m ON st.o_custkey = m.doc_id),
         |regs AS (
         |  SELECT s, bucket, max(${Hll.RhoCase}) AS m
         |  FROM hw GROUP BY 1, 2),
         |agg AS (
         |  SELECT s, count(*) AS seen,
         |    sum(CAST(1::BIGINT << (56 - m) AS HUGEINT)) AS s_seen
         |  FROM regs GROUP BY 1),
         |est0 AS (
         |  SELECT s, seen,
         |    CAST(CAST('${Hll.AlphaNumer}' AS HUGEINT) // (s_seen +
         |      (512 - seen) * CAST('72057594037927936' AS HUGEINT))
         |      AS DOUBLE) / 10000.0 AS approx
         |  FROM agg),
         |est AS (
         |  SELECT s,
         |    CASE WHEN approx <= 1280.0 AND seen < 512
         |         THEN round(512 * ln(512.0 / (512 - seen)), 4)
         |         ELSE approx END AS approx
         |  FROM est0),
         |wide AS (
         |  SELECT max(CASE WHEN s = 'a' THEN approx END) AS ea,
         |    max(CASE WHEN s = 'b' THEN approx END) AS eb,
         |    max(CASE WHEN s = 'u' THEN approx END) AS eu
         |  FROM est),
         |exact AS (
         |  SELECT CAST(sum(in_a) AS BIGINT) AS exact_a,
         |    CAST(sum(in_b) AS BIGINT) AS exact_b,
         |    count(*) AS exact_union,
         |    CAST(sum(in_a * in_b) AS BIGINT) AS exact_inter
         |  FROM members)
         |SELECT round(ea, 4) AS approx_a, round(eb, 4) AS approx_b,
         |  round(eu, 4) AS approx_union,
         |  round(greatest(0.0, ea + eb - eu), 4) AS approx_inter,
         |  round(greatest(0.0, ea + eb - eu) / eu, 6) AS approx_jaccard,
         |  exact_a, exact_b, exact_union, exact_inter
         |FROM wide CROSS JOIN exact""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
