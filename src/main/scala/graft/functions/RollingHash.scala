package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting via polynomial rolling hash mod 2^61-1 —
  * a native Catalyst `Expression` with full codegen support, so it stays
  * inside WholeStageCodegen (unlike a Scala UDF, which forces object
  * boxing and breaks the codegen span).
  *
  * hash(s) = Σ s[i] · B^i  (mod M),  B = 131, M = 2^61 - 1 (Mersenne).
  */
object RollingHash {
  final val Base = 131L
  final val Mod = (1L << 61) - 1

  /** Static entry point referenced by the generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var p = 1L
    var i = 0
    while (i < bytes.length) {
      h = (h + mulmod(bytes(i) & 0xFFL, p)) % Mod
      p = mulmod(p, Base)
      i += 1
    }
    h
  }

  /** (a*b) mod 2^61-1 without overflow, via 128-bit split multiply. */
  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // a,b < 2^61 => hi < 2^58
    val lo = a * b
    // 2^64 ≡ 8 and 2^61 ≡ 1 (mod M): fold hi*2^64 + lo into 61 bits
    val folded = (lo & Mod) + (lo >>> 61) + (hi << 3)
    val r = (folded & Mod) + (folded >>> 61)
    if (r >= Mod) r - Mod else r
  }

  def rolling_hash(c: Column): Column =
    Bridge.column(RollingHashExpr(Bridge.expression(c.cast("string"))))
}

case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
