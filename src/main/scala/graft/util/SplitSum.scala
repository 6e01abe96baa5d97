package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact integer aggregation without wide-decimal buffers.
  *
  * `sum(decimal(p>18))` forces the UnsafeRow byte-array buffer path:
  * every per-row update deserialises a BigInteger, adds through
  * BigDecimal, and serialises back — measured ~4.4 s for 14 such sums
  * over 600k rows on one core (a99 at sf0.1, where the single-row-group
  * scan stage is serial). When the addends are integers that fit a
  * long, the identical exact sum can be computed as THREE plain long
  * sums (21-bit limbs), fully codegen'd and map-side combinable, then
  * reassembled into a decimal once per group at the end:
  *
  *   Σv = 2⁴²·Σ(v div 2⁴²) + 2²¹·Σ((v div 2²¹) mod 2²¹) + Σ(v mod 2²¹)
  *
  * Overflow safety under ANSI: each limb is < 2²¹, so a limb sum stays
  * below rows·2²¹ — no overflow until 2⁴² rows (≈ 4.4·10¹² rows, one
  * decade past the 100 TB lineitem row count); the reassembly is exact
  * decimal(38,0) algebra. The reconstructed value is the SAME exact
  * integer the decimal sum would produce, so the final double is
  * bit-identical — this is a representation change, not an
  * approximation. Requires v ≥ 0 (all uses are scaled money/counts;
  * `div`/`%` limb algebra would need sign handling otherwise).
  */
object SplitSum {
  private val Shift = 21
  private val K: Long = 1L << Shift // 2^21
  private val K2: Long = 1L << (2 * Shift) // 2^42

  /** The three limb-sum aggregate columns for Σ of a nonnegative long
    * expression `v` (per-row v ≥ 0), named `p_h`/`p_m`/`p_l` — bit
    * shifts and masks, so the whole update is long codegen.
    */
  def sums(v: Column, p: String): Seq[Column] = Seq(
    sum(shiftright(v, 2 * Shift)).as(s"${p}_h"),
    sum(shiftright(v, Shift).bitwiseAND(lit(K - 1))).as(s"${p}_m"),
    sum(v.bitwiseAND(lit(K - 1))).as(s"${p}_l"))

  /** Exact Σv reassembled from the limb sums, divided by 10^`tens`
    * (the fixed-point scale of v), as a DOUBLE — bit-identical to
    * `sum(cast(x as decimal(30,tens))).cast(double)` over the same
    * exact addends.
    */
  def value(p: String, tens: Int): Column = {
    val d = DecimalType(38, 0)
    val s = col(s"${p}_h").cast(d) * lit(K2) +
      col(s"${p}_m").cast(d) * lit(K) + col(s"${p}_l").cast(d)
    (s / lit(math.pow(10, tens).toLong)).cast("double")
  }

  /** Exact Σv reassembled from the limb sums as DECIMAL(38,0) — the
    * same exact integer `sum(cast(v as decimal(38,0)))` would produce,
    * for callers that keep computing in decimal (a50's moment algebra).
    */
  def total(p: String): Column = {
    val d = DecimalType(38, 0)
    col(s"${p}_h").cast(d) * lit(K2) +
      col(s"${p}_m").cast(d) * lit(K) + col(s"${p}_l").cast(d)
  }
}
