package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index for multi-dimensional data layout — the
  * locality-preserving sibling of `f16_zorder_key`. Writing a 100 TB
  * table sorted by the Hilbert index of its two hottest filter columns
  * gives range scans on EITHER column near-contiguous file footprints
  * (the curve never jumps, unlike Z-order's seam discontinuities), so
  * min/max zone maps prune harder for the same file count.
  *
  * Implemented as a native Catalyst `Expression` with codegen (the
  * per-row bit loop stays inside WholeStageCodegen, same discipline as
  * [[RollingHash]]). The mapping is the classic xy2d walk (Wikipedia,
  * "Hilbert curve"): 8 levels over a 256×256 grid, quadrant reflection
  * about n−1 then axis swap — verified bijective with unit-step
  * adjacency for consecutive d.
  */
object Hilbert {

  final val Order = 8
  final val N = 1 << Order // 256

  /** (x, y) in [0, 256)² → position d in [0, 65536) on the H₈ curve. */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & (N - 1)
    var y = y0 & (N - 1)
    var d = 0L
    var s = N / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = N - 1 - x; y = N - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  def hilbert_key(x: Column, y: Column): Column =
    Bridge.column(HilbertExpr(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long"))))

  /** The same walk as one unrolled DuckDB CTE chain (level s per CTE),
    * carrying (x, y, d); the oracle replays the exact integer recurrence.
    */
  def oracleLevels(from: String): String = {
    val levels = (0 until Order).map { i =>
      val s = N >> (i + 1)
      val prev = if (i == 0) from else s"h$i"
      s"""h${i + 1} AS (
         |  SELECT key,
         |    CASE WHEN ((y // $s) % 2) = 1 THEN x
         |         WHEN ((x // $s) % 2) = 1 THEN ${N - 1} - y
         |         ELSE y END AS x,
         |    CASE WHEN ((y // $s) % 2) = 1 THEN y
         |         WHEN ((x // $s) % 2) = 1 THEN ${N - 1} - x
         |         ELSE x END AS y,
         |    d + ${s.toLong * s} *
         |      xor(3 * ((x // $s) % 2), (y // $s) % 2) AS d
         |  FROM $prev)""".stripMargin
    }
    levels.mkString(",\n")
  }

  // ---- registered query: Hilbert key over (custkey mod 256, balance
  // cents mod 256) — the pair a layout job would sort on before writing.

  private val q = Q(
    "f17_hilbert_key",
    (s, d) => {
      val x = pmod(col("c_custkey"), lit(256L))
      val y = pmod(expr("CAST(round(c_acctbal * 100) AS BIGINT)"), lit(256L))
      Tables(s, d).customer
        .select(col("c_custkey"), x.as("hx"), y.as("hy"))
        .withColumn("hkey", hilbert_key(col("hx"), col("hy")))
    },
    Some(
      s"""WITH base AS (
         |  SELECT c_custkey AS key,
         |    ((c_custkey % 256) + 256) % 256 AS x,
         |    ((CAST(round(c_acctbal * 100) AS BIGINT) % 256) + 256) % 256
         |      AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM customer),
         |${oracleLevels("base")},
         |fin AS (SELECT key, d FROM h$Order)
         |SELECT b.key AS c_custkey, b.x AS hx, b.y AS hy, fin.d AS hkey
         |FROM base b JOIN fin ON b.key = fin.key""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}

case class HilbertExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.Hilbert.xy2d($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
