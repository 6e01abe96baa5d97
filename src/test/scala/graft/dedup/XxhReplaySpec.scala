package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent bit-replay of the XXH64 PRODUCTION minhash path.
  *
  * The FNV signature mode is hash-checked against DuckDB
  * (`d_minhash_signatures`); the XXH64 mode cannot be (no xxhash64 in
  * DuckDB, and a byte-loop SQL replay is computationally absurd), so its
  * oracle is THIS spec: a from-scratch implementation of the public
  * XXH64 algorithm (Yann Collet's xxHash specification — seeded 64-bit
  * variant with the 5 prime constants, 32-byte stripe accumulators and
  * the final avalanche), written against the spec rather than Spark's
  * source, replaying the full signature chain
  *
  *   h       = XXH64(utf8(shingle), 42)
  *   seed(j) = XXH64(le32(j), 42)
  *   m_j     = min over shingles of XXH64(le64(h), seed(j))
  *   bandKey = fold XXH64 over the band's 4 slots from seed 42
  *
  * bit-for-bit over the sf0.001 corpus. Agreement of two independent
  * implementations of a published algorithm is the same evidential
  * shape as the DuckDB recursive-CTE oracle for the FNV fold.
  */
class XxhReplaySpec extends SparkSpec {

  // ---- independent XXH64 (from the public specification) ----

  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  private def round(acc: Long, lane: Long): Long =
    rotl(acc + lane * P2, 31) * P1

  private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  private def le64(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 7
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
    v
  }

  private def le32(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 3
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
    v
  }

  private def xxh64(input: Array[Byte], seed: Long): Long = {
    val len = input.length
    var i = 0
    var acc =
      if (len >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i + 32 <= len) {
          v1 = round(v1, le64(input, i))
          v2 = round(v2, le64(input, i + 8))
          v3 = round(v3, le64(input, i + 16))
          v4 = round(v4, le64(input, i + 24))
          i += 32
        }
        var a = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        a = mergeRound(a, v1); a = mergeRound(a, v2)
        a = mergeRound(a, v3); mergeRound(a, v4)
      } else seed + P5
    acc += len.toLong
    while (i + 8 <= len) {
      acc = rotl(acc ^ round(0L, le64(input, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      acc = rotl(acc ^ (le32(input, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      acc = rotl(acc ^ ((input(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    acc ^= acc >>> 33; acc *= P2
    acc ^= acc >>> 29; acc *= P3
    acc ^ (acc >>> 32)
  }

  private def xxhString(s: String, seed: Long): Long =
    xxh64(s.getBytes("UTF-8"), seed)

  private def xxhLong(l: Long, seed: Long): Long = {
    val b = new Array[Byte](8)
    var k = 0; while (k < 8) { b(k) = ((l >>> (8 * k)) & 0xff).toByte; k += 1 }
    xxh64(b, seed)
  }

  private def xxhInt(v: Int, seed: Long): Long = {
    val b = new Array[Byte](4)
    var k = 0; while (k < 4) { b(k) = ((v >>> (8 * k)) & 0xff).toByte; k += 1 }
    xxh64(b, seed)
  }

  // ---- the signature chain, replayed on the independent impl ----

  private val Seed = 42L
  private val NumHashes = 64
  private val ShingleN = 3

  private def shinglesOf(text: String): Seq[String] = {
    val words = text.split(" ", -1)
    val n = math.max(words.length - ShingleN + 1, 1)
    (0 until n).map(i =>
      words.slice(i, math.min(i + ShingleN, words.length)).mkString(" "))
  }

  private def replaySignature(text: String): Array[Long] = {
    val seeds = Array.tabulate(NumHashes)(j => xxhInt(j, Seed))
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    shinglesOf(text).foreach { sh =>
      val h = xxhString(sh, Seed)
      var j = 0
      while (j < NumHashes) {
        val hj = xxhLong(h, seeds(j))
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
    }
    mins
  }

  test("spec-built XXH64 agrees with Spark's xxhash64 on strings and longs") {
    import spark.implicits._
    val samples = Seq("", "a", "abcd", "12345678", "the quick brown fox",
      "x" * 31, "y" * 32, "z" * 100, "unicode: żółć 你好")
    val got = samples.toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(got(s) == xxhString(s, Seed), s"string '$s'")
    }
    val longs = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L)
    val gotL = longs.toDF("l")
      .select(col("l"), xxhash64(col("l")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    longs.foreach(l => assert(gotL(l) == xxhLong(l, Seed), s"long $l"))
  }

  test("production minhash signatures bit-replay on the sf0.001 corpus") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = MinHashDedup.signatures(docs)
    val mCols = (0 until NumHashes).map(j => col(s"m$j"))
    val rows = got.select(col("doc_id") +: mCols: _*).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      val expect = replaySignature(texts(id))
      val actual = (0 until NumHashes).map(j => r.getLong(j + 1))
      assert(actual == expect.toSeq, s"doc $id signature mismatch")
    }
  }

  test("band keys bit-replay: the seed-42 fold over 4 slots") {
    import spark.implicits._
    // Spark's xxhash64(a,b,c,d) folds left from seed 42: the replay is
    // h = xxh(a,42); h = xxh(b,h); ... — pin that chain, which the LSH
    // banding relies on for cross-run bucket stability
    val slots = Seq((11L, 22L, 33L, 44L), (0L, 0L, 0L, 0L),
      (-5L, Long.MaxValue, 7L, -9L))
    val got = slots.toDF("a", "b", "c", "d")
      .select(xxhash64(col("a"), col("b"), col("c"), col("d")).as("h"))
      .collect().map(_.getLong(0))
    slots.zip(got).foreach { case ((a, b, c, d), h) =>
      val replay = xxhLong(d, xxhLong(c, xxhLong(b, xxhLong(a, Seed))))
      assert(h == replay, s"band fold ($a,$b,$c,$d)")
    }
  }
}
