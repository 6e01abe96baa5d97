package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-stable numeric aggregation.
  *
  * `SUM(double)` is order-dependent (partial aggregation reorders the
  * additions), so a Spark sum and a DuckDB sum of the same doubles can
  * differ in the last ulp and break hash-parity with the oracle. Casting
  * each addend to an exact decimal first makes the sum associative and
  * therefore bit-identical regardless of partitioning — and it is also
  * the right call at 100 TB, where a 1000-way partial agg would otherwise
  * make results non-reproducible run-to-run.
  *
  * The final cast back to double is deterministic (correctly-rounded
  * decimal→binary in both engines), keeping the published schema simple.
  */
object Stable {
  // precision 30 (128-bit in both engines): 18 digits overflow-throws
  // under ANSI once row counts reach cluster scale (1e12 rows × 1e5
  // values = 1e17 > 10^(18-4) integral digits); 30 leaves 20+ integral
  // digits at scale 9 — exactness is unchanged either way
  private val Precision = 30

  /** Order-independent sum of a double column, exact at `scale` dp.
    *
    * SCALE CHOICE RULE (measured, a86): the two engines convert
    * double→decimal differently — Spark via exact-binary BigDecimal,
    * DuckDB via a scaled multiply that itself rounds in double — so
    * the casts only agree while |term|·10^scale < 2^53 (≈ 9·10^15).
    * Large-magnitude terms (S²/n sums of squares, ~10^13+) must use
    * scale 0; tiny terms (inverse-variance weights, ~10^-7) want
    * scale 18. Pick scale ≈ 15 − log10(max |term|).
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(Precision, scale))).cast(DoubleType)

  /** Matching DuckDB SQL fragment. */
  def dsumSql(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL($Precision,$scale))) AS DOUBLE)"

  /** Order-independent mean: exact decimal sum / count, one IEEE divide. */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(lit(1))

  def davgSql(expr: String, scale: Int = 4): String =
    s"(${dsumSql(expr, scale)} / COUNT(*))"
}
