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
    regs
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("seen"),
        sum(expr("cast(shiftleft(1L, 56 - m) as decimal(38,0))"))
          .as("s_seen"))
      .select(keys.map(col) :+
        (col("s_seen") +
          (lit(M).cast("decimal(38,0)") - col("seen")) *
            lit(72057594037927936L).cast("decimal(38,0)")).as("s_total"): _*)
      .select(keys.map(col) :+
        (expr(s"cast('$AlphaNumer' as decimal(38,0)) div s_total")
          .cast("double") / lit(10000.0)).as("approx"): _*)

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
