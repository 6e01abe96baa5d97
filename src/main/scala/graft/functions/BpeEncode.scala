package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer APPLY (Sennrich et al. 2016 encode step): segment a
  * word by a fixed, ordered merge-rule table. This is the production
  * half of BPE — the vocab is trained once offline, then applied to
  * every document forever; applying it to a 100 TB corpus is the part
  * that must scale. (`t_bpe_merge_candidates` is the corpus-statistics
  * half of the trainer.)
  *
  * Semantics (deterministic, replayed verbatim by the DuckDB oracle):
  * start from per-code-point symbols; repeatedly take the LOWEST-RANK
  * rule that matches anywhere in the word and merge its LEFTMOST
  * occurrence; stop when no rule applies. One merge per step keeps the
  * recursion linear in the word length, which is what makes the oracle
  * a recursive CTE rather than a fixpoint program.
  *
  * A native codegen Expression so the per-word loop stays inside
  * WholeStageCodegen; callers encode DISTINCT words and join counts
  * back, so the loop runs |vocabulary| times, not |corpus| times.
  */
object BpeEncode {

  /** Ordered merge table (rank = array index + 1) — a small, frequent
    * English-bigram vocab standing in for a trained one; every
    * multi-character left/right side is producible by an earlier rule.
    */
  val Merges: Array[(String, String)] = Array(
    "t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t",
    "o" -> "r", "e" -> "n", "e" -> "s", "o" -> "u", "l" -> "l")

  /** The merge loop is O(|rules|·L) per merge and up to L merges — a
    * pathological unbroken token (a 10 kB URL or base64 blob in a raw
    * web corpus) would pay O(|rules|·L²). Words longer than this stay
    * UNSEGMENTED (per-code-point symbols, no merges) — the same contract
    * real tokenizers apply (HF `max_input_chars_per_word`: overlong
    * words bypass the merge search). The oracle enforces the identical
    * cap, so the bound is part of the verified semantics, not a comment.
    */
  val MaxWordLen = 512

  /** Static entry point referenced by the generated code. */
  def encode(word: UTF8String): ArrayData = {
    val s = word.toString
    val syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      syms.add(s.substring(i, i + n))
      i += n
    }
    var applied = syms.size <= MaxWordLen
    while (applied) {
      applied = false
      var r = 0
      while (r < Merges.length && !applied) {
        val l = Merges(r)._1
        val rt = Merges(r)._2
        var j = 0
        while (j < syms.size - 1 && !applied) {
          if (syms.get(j) == l && syms.get(j + 1) == rt) {
            syms.set(j, l + rt)
            syms.remove(j + 1)
            applied = true
          }
          j += 1
        }
        r += 1
      }
    }
    val out = new Array[AnyRef](syms.size())
    var k = 0
    while (k < out.length) {
      out(k) = UTF8String.fromString(syms.get(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  def bpe_encode(c: Column): Column =
    Bridge.column(BpeEncodeExpr(Bridge.expression(c.cast("string"))))
}

case class BpeEncodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeEncode.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
