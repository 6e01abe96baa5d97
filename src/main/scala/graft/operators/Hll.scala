package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The cross-engine-replayable HyperLogLog pieces, shared between the
  * batch row (`a16b_hll_distinct`) and its streaming twin: value hash =
  * fnv1a64 ∘ fmix64, m = 512 registers (index = low 9 bits), rho =
  * leading-zero rank of the remaining 55-bit window, estimate =
  * α·m²/Σ2^-M computed entirely in integers (see a16b's scaladoc for
  * why each piece is shaped the way it is).
  *
  * The register table (keys…, bucket, max rho) is the sketch: mergeable
  * by MAX, which is also why it streams — max is an associative,
  * idempotent streaming aggregate, so a watermark-free Complete-mode
  * groupBy maintains exactly the batch registers.
  */
object Hll {

  val M = 512
  val AlphaNumer = BigInt("135963185971444108492800000")

  /** Identical CASE text evaluates in BOTH engines: rho = 1 + leading
    * zeros of the 55-bit window w (w = 0 → all 55 zero → 56).
    */
  val RhoCase: String = (1 to 55)
    .map(r => s"WHEN w >= ${1L << (55 - r)} THEN $r")
    .mkString("CASE ", " ", " ELSE 56 END")

  /** (keys…, bucket, rho) — one row per input row, pure map stage. */
  def bucketRho(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val h = graft.functions.TextSketches.hll_hash(value.cast("string"))
    df.select(keys.map(col) :+ h.as("h"): _*)
      .select(keys.map(col) :+
        col("h").bitwiseAND(lit((M - 1).toLong)).as("bucket") :+
        shiftrightunsigned(col("h"), 9).as("w"): _*)
      .select(keys.map(col) :+ col("bucket") :+ expr(RhoCase).as("rho"): _*)
  }

  /** Register maxes → per-key estimate column `approx` (4-dp truncated,
    * integer-division exact). Input: (keys…, bucket, m).
    */
  def estimate(regs: DataFrame, keys: Seq[String]): DataFrame =
    estimate2(regs, keys).drop("seen")

  /** [[estimate]] keeping the occupied-register count `seen` — the
    * small-range (linear-counting) correction needs V = m − seen.
    */
  def estimate2(regs: DataFrame, keys: Seq[String]): DataFrame =
    regs
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("seen"),
        sum(expr("cast(shiftleft(1L, 56 - m) as decimal(38,0))"))
          .as("s_seen"))
      .select(keys.map(col) :+ col("seen") :+
        (col("s_seen") +
          (lit(M).cast("decimal(38,0)") - col("seen")) *
            lit(72057594037927936L).cast("decimal(38,0)")).as("s_total"): _*)
      .select(keys.map(col) :+ col("seen") :+
        (expr(s"cast('$AlphaNumer' as decimal(38,0)) div s_total")
          .cast("double") / lit(10000.0)).as("approx"): _*)

  /** [[estimate2]] plus the Flajolet small-range correction (linear
    * counting below 2.5·m with empty registers left) — the estimator the
    * windowed rollup and HyperBall share; one ln over an exact integer
    * ratio, rounded to 4 dp, deterministic in both engines.
    */
  def estimateCorrected(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val raw = estimate2(regs, keys)
    val v = lit(M.toLong) - col("seen")
    raw.select(keys.map(col) :+
      when(col("approx") <= lit(2.5 * M) && v > 0,
        round(lit(M) * log(lit(M.toDouble) / v.cast("double")), 4))
        .otherwise(col("approx")).as("approx"): _*)
  }

  /** The full DuckDB replay over `lineitem`, shared by the batch row and
    * the streaming parity row (same registers ⇒ same oracle).
    */
  def lineitemOracle: String =
    s"""WITH RECURSIVE
       |items AS (SELECT DISTINCT l_orderkey AS doc_id, 0 AS i,
       |            CAST(l_orderkey AS VARCHAR) AS t FROM lineitem),
       |${graft.functions.OracleSql.fnvFold("items")},
       |${graft.functions.OracleSql.fmix64},
       |hw AS (
       |  SELECT l.l_returnflag, m.u % 512 AS bucket, m.u // 512 AS w
       |  FROM lineitem l JOIN mixed m ON l.l_orderkey = m.doc_id),
       |regs AS (
       |  SELECT l_returnflag, bucket, max($RhoCase) AS m
       |  FROM hw GROUP BY 1, 2),
       |agg AS (
       |  SELECT l_returnflag, count(*) AS seen,
       |    sum(CAST(1::BIGINT << (56 - m) AS HUGEINT)) AS s_seen
       |  FROM regs GROUP BY 1),
       |ex AS (
       |  SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders
       |  FROM lineitem GROUP BY 1)
       |SELECT a.l_returnflag,
       |  CAST(CAST('$AlphaNumer' AS HUGEINT) // (a.s_seen +
       |    (512 - a.seen) * CAST('72057594037927936' AS HUGEINT))
       |    AS DOUBLE) / 10000.0 AS approx_orders,
       |  CAST(ex.exact_orders AS BIGINT) AS exact_orders
       |FROM agg a JOIN ex ON a.l_returnflag = ex.l_returnflag""".stripMargin
}

/** Time-windowed HLL rollup — the sketch × window composition a 100 TB
  * metrics pipeline runs everywhere ("distinct suppliers per week, and
  * overall"): per-week register tables built in ONE scan, and the
  * global estimate produced by MAX-MERGING the weekly registers — never
  * rescanning the corpus. This is the register-mergeability property
  * a16b documents, exercised across TIME partitions the way a26
  * exercises it across shards: rolling a dashboard up from weeks to
  * all-time touches 512·|weeks| register rows, not the data. Both
  * granularities sit in one result under the same oracle, so the gate
  * proves merged-weeks ≡ whole-corpus.
  */
object WindowedHll {

  import graft.{Q, Tables}

  /** Week key anchored pre-epoch so day diffs stay positive (Spark's
    * `div` truncates toward zero, DuckDB's `//` floors — they only
    * agree on non-negative operands).
    */
  private val Anchor = "1990-01-06"

  /** [[Hll.estimate]] plus the Flajolet small-range correction
    * (HyperLogLog paper, 2007): when the raw estimate is below 2.5·m
    * and empty registers remain, linear counting m·ln(m/V) is the
    * better estimator — and at per-week supplier cardinalities (tens,
    * against m = 512) the raw formula is not just imprecise but
    * structurally biased high. One ln over an exact integer ratio,
    * deterministic in both engines. (a16b's order cardinalities sit
    * far above the threshold, so its raw-only formula stands.)
    */
  private def estimateCorrected(regs: DataFrame,
      keys: Seq[String]): DataFrame = Hll.estimateCorrected(regs, keys)

  private val q = Q(
    "w13_windowed_hll",
    (s, d) => {
      val li = Tables(s, d).lineitem
        .withColumn("wk",
          expr(s"datediff(to_date(l_shipdate), date '$Anchor') div 7"))
      val weekRegs = Hll
        .bucketRho(li, Seq("wk"), col("l_suppkey"))
        .groupBy("wk", "bucket")
        .agg(max(col("rho")).as("m"))
        .localCheckpoint(false)
      val weekly = estimateCorrected(weekRegs, Seq("wk"))
        .join(li.groupBy("wk")
          .agg(countDistinct(col("l_suppkey")).as("exact")), "wk")
        .select(concat(lit("w:"), col("wk")).as("period"),
          col("approx"), col("exact"))
      // global = register merge of the weekly sketches (max is
      // associative+idempotent), plus the exact check
      val allRegs = weekRegs.groupBy("bucket")
        .agg(max(col("m")).as("m")).withColumn("g", lit(0))
      val global = estimateCorrected(allRegs, Seq("g"))
        .crossJoin(broadcast(
          li.agg(countDistinct(col("l_suppkey")).as("exact"))))
        .select(lit("all").as("period"), col("approx"), col("exact"))
      weekly.unionByName(global)
    },
    Some(
      s"""WITH RECURSIVE
         |items AS (SELECT DISTINCT l_suppkey AS doc_id, 0 AS i,
         |            CAST(l_suppkey AS VARCHAR) AS t FROM lineitem),
         |${graft.functions.OracleSql.fnvFold("items")},
         |${graft.functions.OracleSql.fmix64},
         |hw AS (
         |  SELECT (CAST(l.l_shipdate AS DATE) - DATE '$Anchor') // 7
         |           AS wk,
         |         l.l_suppkey, m.u % 512 AS bucket, m.u // 512 AS w
         |  FROM lineitem l JOIN mixed m ON l.l_suppkey = m.doc_id),
         |wregs AS (
         |  SELECT wk, bucket, max(${Hll.RhoCase}) AS m
         |  FROM hw GROUP BY 1, 2),
         |wagg AS (
         |  SELECT wk, count(*) AS seen,
         |    sum(CAST(1::BIGINT << (56 - m) AS HUGEINT)) AS s_seen
         |  FROM wregs GROUP BY 1),
         |wex AS (SELECT wk, count(DISTINCT l_suppkey) AS exact
         |        FROM hw GROUP BY 1),
         |aregs AS (SELECT bucket, max(m) AS m FROM wregs GROUP BY 1),
         |aagg AS (
         |  SELECT count(*) AS seen,
         |    sum(CAST(1::BIGINT << (56 - m) AS HUGEINT)) AS s_seen
         |  FROM aregs),
         |aex AS (SELECT count(DISTINCT l_suppkey) AS exact FROM lineitem),
         |wraw AS (
         |  SELECT wk, seen,
         |    CAST(CAST('${Hll.AlphaNumer}' AS HUGEINT) // (s_seen +
         |      (512 - seen) * CAST('72057594037927936' AS HUGEINT))
         |      AS DOUBLE) / 10000.0 AS raw
         |  FROM wagg),
         |araw AS (
         |  SELECT seen,
         |    CAST(CAST('${Hll.AlphaNumer}' AS HUGEINT) // (s_seen +
         |      (512 - seen) * CAST('72057594037927936' AS HUGEINT))
         |      AS DOUBLE) / 10000.0 AS raw
         |  FROM aagg)
         |SELECT 'w:' || CAST(w.wk AS VARCHAR) AS period,
         |  CASE WHEN w.raw <= 1280.0 AND (512 - w.seen) > 0
         |       THEN round(512 * ln(512.0 / (512 - w.seen)), 4)
         |       ELSE w.raw END AS approx,
         |  CAST(x.exact AS BIGINT) AS exact
         |FROM wraw w JOIN wex x USING (wk)
         |UNION ALL
         |SELECT 'all',
         |  CASE WHEN a.raw <= 1280.0 AND (512 - a.seen) > 0
         |       THEN round(512 * ln(512.0 / (512 - a.seen)), 4)
         |       ELSE a.raw END,
         |  CAST(aex.exact AS BIGINT)
         |FROM araw a CROSS JOIN aex""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
