package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** FNV-mode sketches: the oracle-replayable twins of the XXH64 sketches.
  * The DuckDB oracles hash-check these end-to-end at verify time; this
  * spec pins the JVM-side values against an independent re-fold so a
  * refactor can't silently change the hash family between verify runs.
  */
class FnvSketchSpec extends SparkSpec {

  private def refFnv(s: String): Long = {
    var ck = 1469598103934665603L
    s.getBytes("UTF-8").foreach(b => ck = (ck ^ (b & 0xffL)) * 1099511628211L)
    ck
  }

  test("fnv1a64 matches an independent byte fold") {
    for (s <- Seq("", "a", "spark", "key agg row", "the quick brown fox")) {
      assert(TextSketches.fnv1a64(UTF8String.fromString(s)) === refFnv(s))
    }
  }

  test("simhash64Fnv votes per token like the reference fold") {
    val text = "key agg row scan key"
    val toks = text.split(" ", -1)
    var exp = 0L
    val votes = Array.fill(64)(0)
    toks.foreach { t =>
      val h = refFnv(t)
      (0 until 64).foreach(b =>
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1)
    }
    (0 until 64).foreach(b => if (votes(b) > 0) exp |= (1L << b))
    assert(TextSketches.simhash64Fnv(UTF8String.fromString(text)) === exp)
  }

  test("minhashSigFnv slots are the universal family over 2^31-1 " +
    "(incl. irregular whitespace: empty tokens keep their separator)") {
    // the doubled space makes words = [..., "", ...]; mkString below —
    // like the SQL oracle's array_to_string — keeps the separator, so
    // this test pins the shingle-builder parity a buffer-emptiness
    // guard would silently break
    val text = "a  b c  d e f"
    val words = text.split(" ", -1)
    val shingles = (0 until math.max(words.length - 2, 1))
      .map(i => words.slice(i, i + 3).mkString(" "))
    val hs = shingles.map(s =>
      java.lang.Long.remainderUnsigned(refFnv(s), TextSketches.P31))
    val sig = TextSketches.minhashSigFnv(UTF8String.fromString(text))
    (0 until TextSketches.NumHashes).foreach { j =>
      val a = ((j + 1) * 2654435761L) % TextSketches.P31
      val b = ((j + 1) * 2246822519L) % TextSketches.P31
      val exp = hs.map(h => (a * h + b) % TextSketches.P31).min
      assert(sig.getLong(j) === exp, s"slot $j")
      assert(sig.getLong(j) >= 0 && sig.getLong(j) < TextSketches.P31)
    }
  }

  test("deterministicSample is key-pure: stable under repartition, ~rate") {
    import spark.implicits._
    val df = (1 to 10000).toDF("k")
    val a = graft.operators.SourcesSinks
      .deterministicSample(df, "k", 0.1).collect().map(_.getInt(0)).toSet
    val b = graft.operators.SourcesSinks
      .deterministicSample(df.repartition(13), "k", 0.1)
      .collect().map(_.getInt(0)).toSet
    assert(a === b)
    assert(math.abs(a.size / 10000.0 - 0.1) < 0.02)
    // rate 1.0 keeps everything (hex-threshold edge)
    assert(graft.operators.SourcesSinks
      .deterministicSample(df, "k", 1.0).count() === 10000)
  }
}

class QuantileSketchSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("sketch quantiles land within one bin width of the exact quantiles") {
    val dir = sf("sf0.001")
    val li = spark.read.parquet(dir + "/lineitem.parquet")
    val est = graft.operators.Extended.quantileSketch(li).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(est.size == 5)
    val qs = est.keys.toArray.sorted
    val exact = li.stat.approxQuantile("l_extendedprice", qs, 0.0)
    val Array(lo, hi) = li.agg(min("l_extendedprice"), max("l_extendedprice"))
      .collect().map(r => Array(r.getDouble(0), r.getDouble(1))).head
    val binWidth = (hi - lo) / 256
    qs.zip(exact).foreach { case (q, ex) =>
      assert(math.abs(est(q) - ex) <= binWidth + 1e-9,
        s"q=$q est=${est(q)} exact=$ex width=$binWidth")
    }
  }
}
