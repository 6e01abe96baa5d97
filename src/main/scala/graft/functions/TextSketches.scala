package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local text sketches as native codegen'd Catalyst expressions.
  *
  * SimHash and MinHash signatures are per-document computations; the
  * first implementation exploded tokens and ran 64 aggregate columns —
  * a full shuffle of every token in the corpus. These expressions do the
  * whole sketch inside the scan's WholeStageCodegen span: zero shuffle,
  * zero extra pass, identical hash values (they reuse Spark's XXH64 with
  * the same seed/chaining as the `xxhash64` SQL function, so results are
  * bit-compatible with the aggregation formulation).
  *
  * At 100 TB this is the difference between "shuffle 100 TB of tokens"
  * and "read the corpus once".
  */
object TextSketches {
  final val XxSeed = 42L // Spark's xxhash64 default seed
  final val NumHashes = 64
  final val ShingleN = 3

  // FNV-1a-style 64-bit fold — same constants as the multimodal stub
  // decoder's checksum (MultimodalQueries.scala), because that pair is
  // already replayed byte-for-byte by a DuckDB recursive CTE: any sketch
  // built on this fold gets a hash-exact oracle, which xxhash64 (XXH64's
  // rotate/lane mixing has no tractable SQL form) cannot. Production
  // default stays XXH64 (Spark-native, bit-compatible with the SQL
  // `xxhash64` function); FNV mode exists so the correctness gate can
  // hash-check the FULL sketch pipeline, not just specs.
  final val FnvBasis = 1469598103934665603L
  final val FnvPrime = 1099511628211L
  // universal-hash family for FNV-mode minhash slots, over the Mersenne
  // prime 2^31-1: slot_j(h) = (a_j·(h mod p) + b_j) mod p with a_j, b_j
  // derived from j by fixed multipliers — every operand stays < 2^62, so
  // the same arithmetic runs overflow-free in BIGINT SQL.
  final val P31 = 2147483647L
  private val fnvA: Array[Long] =
    Array.tabulate(NumHashes)(j => ((j + 1) * 2654435761L) % P31)
  private val fnvB: Array[Long] =
    Array.tabulate(NumHashes)(j => ((j + 1) * 2246822519L) % P31)

  /** One shingle of up to `n` words from `i`, joined with single spaces —
    * exactly `concat_ws(' ', w[i], …)` / `array_to_string(w[i+1:i+n])`
    * semantics: words past the end are skipped, but EMPTY words (from
    * consecutive/leading separators) keep their separator, so "a  b"
    * shingles to "a  b", not "a b". The position-based guard matters:
    * a buffer-emptiness guard silently eats the separator after an
    * empty first word and breaks hash parity with the SQL oracles.
    */
  private def buildShingle(sb: java.lang.StringBuilder, words: Array[String],
      i: Int, n: Int): Unit = {
    sb.setLength(0)
    var k = 0
    while (k < n) {
      if (i + k < words.length) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
      }
      k += 1
    }
  }

  def fnv1a64(s: UTF8String): Long = {
    if (s == null) return FnvBasis
    val bytes = s.getBytes
    var ck = FnvBasis
    var i = 0
    while (i < bytes.length) {
      ck = (ck ^ (bytes(i) & 0xffL)) * FnvPrime // JVM wrapping mul = mod 2^64
      i += 1
    }
    ck
  }

  /** MurmurHash3's 64-bit finalizer (public domain, Appleby): full
    * avalanche over all 64 bits. FNV-1a alone mixes too slowly for
    * rank statistics on short keys — its raw high bits bias an HLL
    * estimate ~20% high on sequential ids — so the HLL hash is
    * fnv1a64 ∘ fmix64. Both halves replay exactly in SQL
    * (OracleSql.fnvFold + OracleSql.fmix64).
    */
  def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def hllHash(s: UTF8String): Long = fmix64(fnv1a64(s))

  /** Unicode NFC normalisation (canonical composition) — the first step
    * of any multilingual corpus cleanup: the same text arrives from the
    * web in composed and decomposed forms, and every downstream
    * hash/dedup/fingerprint treats them as different documents unless
    * normalised. JDK Normalizer; both engines implement the same Unicode
    * standard, which is what makes the row oracle-able.
    */
  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(java.text.Normalizer
      .normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** seeds(j) = XXH64(int j, 42) — the seed chain Spark's
    * xxhash64(lit(j), h) produces for the first argument.
    */
  private val seeds: Array[Long] =
    Array.tabulate(NumHashes)(j => XXH64.hashInt(j, XxSeed))

  /** simhash over space-separated tokens: per-token XXH64 votes. */
  def simhash64(text: UTF8String): Long = {
    if (text == null) return 0L
    val tokens = text.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(tokens(t)), XxSeed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** 64 minhashes over word-`ShingleN` shingles; value-compatible with
    * min(xxhash64(lit(j), xxhash64(shingle))) over exploded shingles.
    */
  def minhashSig(text: UTF8String): ArrayData = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    if (text != null) {
      val words = text.toString.split(" ", -1)
      val nShingles = math.max(words.length - ShingleN + 1, 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < nShingles) {
        buildShingle(sb, words, i, ShingleN)
        val h = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), XxSeed)
        var j = 0
        while (j < NumHashes) {
          val hj = XXH64.hashLong(h, seeds(j))
          if (hj < mins(j)) mins(j) = hj
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** simhash over space-separated tokens, FNV-mode: identical vote logic
    * to [[simhash64]] with [[fnv1a64]] as the token hash — replayable in
    * SQL (recursive-CTE byte fold), so the oracle checks the fingerprint
    * itself, not just the pipeline around it.
    */
  def simhash64Fnv(text: UTF8String): Long = {
    if (text == null) return 0L
    val tokens = text.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = fnv1a64(UTF8String.fromString(tokens(t)))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** 64 minhashes over word-`ShingleN` shingles, FNV-mode: shingle hash
    * is [[fnv1a64]] reduced mod 2^31-1, slot hashes are the (a_j, b_j)
    * universal family above. Values live in [0, 2^31) — a narrower range
    * than the XXH64 chain, irrelevant for min-sketch quality and exactly
    * reproducible by BIGINT-only SQL arithmetic.
    */
  def minhashSigFnv(text: UTF8String): ArrayData = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    if (text != null) {
      val words = text.toString.split(" ", -1)
      val nShingles = math.max(words.length - ShingleN + 1, 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < nShingles) {
        buildShingle(sb, words, i, ShingleN)
        val h = java.lang.Long.remainderUnsigned(
          fnv1a64(UTF8String.fromString(sb.toString)), P31)
        var j = 0
        while (j < NumHashes) {
          val hj = (fnvA(j) * h + fnvB(j)) % P31
          if (hj < mins(j)) mins(j) = hj
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Distinct word n-gram shingles — value-compatible with the
    * `transform(sequence(...), concat_ws(...))` + `array_distinct`
    * column formulation, but a single JVM loop (higher-order array
    * functions run interpreted per element in Spark — ~20µs/shingle
    * there vs ~0.1µs here).
    */
  def shingleArray(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val words = text.toString.split(" ", -1)
    val nShingles = math.max(words.length - n + 1, 1)
    val seen = new java.util.LinkedHashSet[String](nShingles * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nShingles) {
      buildShingle(sb, words, i, n)
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  def simhash(c: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(c.cast("string"))))

  def minhash_signature(c: Column): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(c.cast("string"))))

  def fnv1a(c: Column): Column =
    Bridge.column(Fnv1a64Expr(Bridge.expression(c.cast("string"))))

  def hll_hash(c: Column): Column =
    Bridge.column(HllHashExpr(Bridge.expression(c.cast("string"))))

  def nfc_normalize(c: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(c.cast("string"))))

  def simhash_fnv(c: Column): Column =
    Bridge.column(SimHashFnvExpr(Bridge.expression(c.cast("string"))))

  def minhash_signature_fnv(c: Column): Column =
    Bridge.column(MinHashSigFnvExpr(Bridge.expression(c.cast("string"))))

  def shingles(c: Column, n: Int): Column =
    Bridge.column(ShinglesExpr(Bridge.expression(c.cast("string")), n))
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    TextSketches.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"
  override def nullSafeEval(input: Any): Any =
    TextSketches.shingleArray(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextSketches.shingleArray($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Fnv1a64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a64"
  override def nullSafeEval(input: Any): Any =
    TextSketches.fnv1a64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.fnv1a64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    TextSketches.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class HllHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_hash"
  override def nullSafeEval(input: Any): Any =
    TextSketches.hllHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.hllHash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHashFnvExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_fnv"
  override def nullSafeEval(input: Any): Any =
    TextSketches.simhash64Fnv(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.simhash64Fnv($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashSigFnvExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature_fnv"
  override def nullSafeEval(input: Any): Any =
    TextSketches.minhashSigFnv(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.minhashSigFnv($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def nullSafeEval(input: Any): Any =
    TextSketches.minhashSig(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.minhashSig($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
