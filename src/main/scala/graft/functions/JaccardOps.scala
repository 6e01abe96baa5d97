package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Set-similarity primitives for the exact n-gram Jaccard join.
  *
  * `array_intersect`/`array_union` over string arrays cost ~40µs per
  * candidate pair interpreted; hashing each shingle to a long (XXH64, as
  * everywhere else), sorting once per document in the scan stage, and
  * merge-scanning two sorted long arrays per pair is ~100× cheaper and
  * shrinks the shuffled payload from strings to packed longs. Jaccard on
  * the hash sets equals Jaccard on the string sets absent a 64-bit
  * collision (≈ n²/2⁶⁴ — never at any realistic corpus size), so the
  * DuckDB string-set oracle still hash-matches.
  */
object JaccardOps {

  /** distinct, sorted XXH64 hashes of word n-gram shingles. */
  def sortedShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val sh = TextSketches.shingleArray(text, n)
    val m = sh.numElements()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(sh.getUTF8String(i), TextSketches.XxSeed)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // shingleArray is already distinct, so hashes are too (no collisions)
    new GenericArrayData(hs)
  }

  /** |A∩B| / |A∪B| of two sorted long arrays via merge scan. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 && m == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  /** Threshold-aware variant: the exact Jaccard when it is ≥ `tau`,
    * else -1 — with positional early exit: J ≥ τ needs
    * inter ≥ τ(n+m)/(1+τ); once even a perfect tail cannot reach that,
    * the scan bails. Most candidate pairs are dissimilar, so most scans
    * terminate in a fraction of n+m steps. Exactness is untouched: a
    * pair at or above the threshold always runs to completion.
    */
  def jaccardSortedMin(a: ArrayData, b: ArrayData, tau: Double): Double = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 && m == 0) return -1.0
    val needed = math.ceil(tau * (n + m) / (1.0 + tau)).toInt
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      if (inter + math.min(n - i, m - j) < needed) return -1.0
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val jac = inter.toDouble / (n + m - inter)
    if (jac >= tau) jac else -1.0
  }

  def sorted_shingle_hashes(c: Column, n: Int): Column =
    Bridge.column(SortedShingleHashesExpr(
      Bridge.expression(c.cast("string")), n))

  def jaccard_sorted(a: Column, b: Column): Column =
    Bridge.column(JaccardSortedExpr(Bridge.expression(a),
      Bridge.expression(b)))

  def jaccard_sorted_min(a: Column, b: Column, tau: Double): Column =
    Bridge.column(JaccardSortedMinExpr(Bridge.expression(a),
      Bridge.expression(b), tau))

  case class SortedShingleHashesExpr(child: Expression, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "sorted_shingle_hashes"
    override def nullSafeEval(input: Any): Any =
      sortedShingleHashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.JaccardOps.sortedShingleHashes($c, $n)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class JaccardSortedMinExpr(left: Expression, right: Expression,
      tau: Double) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard_sorted_min"
    override def nullSafeEval(a: Any, b: Any): Any =
      jaccardSortedMin(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        tau)
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.JaccardOps.jaccardSortedMin($a, $b, $tau)")
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
  }

  case class JaccardSortedExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard_sorted"
    override def nullSafeEval(a: Any, b: Any): Any =
      jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.JaccardOps.jaccardSorted($a, $b)")
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
  }
}
