package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native plane-sweep interval join vs the naive inequality join, plus
  * the exec's edge cases (eviction, key changes, nulls, keyless mode).
  */
class IntervalExecSpec extends SparkSpec {
  import spark.implicits._

  private def naive(a: Seq[(Long, Long, Long, Long)],
      b: Seq[(Long, Long, Long, Long)]) =
    (for {
      (ak, aid, as_, ae) <- a; (bk, bid, bs, be) <- b
      if ak == bk && as_ <= be && bs <= ae
    } yield (aid, bid)).toSet

  private def sweep(a: Seq[(Long, Long, Long, Long)],
      b: Seq[(Long, Long, Long, Long)],
      keyed: Boolean = true): Set[(Long, Long)] = {
    val l = a.toDF("ak", "aid", "as_", "ae")
    val r = b.toDF("bk", "bid", "bs", "be")
    val joinedDf =
      if (keyed) IntervalOverlapJoin.overlap(l, r, Seq("ak"), Seq("bk"),
        "as_", "ae", "bs", "be")
      else IntervalOverlapJoin.overlap(
        l.filter(col("ak") === 0L), r.filter(col("bk") === 0L),
        Nil, Nil, "as_", "ae", "bs", "be")
    joinedDf.select("aid", "bid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  test("random intervals, several keys: sweep equals the naive join") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      def gen(n: Int) = (1 to n).map { i =>
        val s = rnd.nextInt(100).toLong
        (rnd.nextInt(3).toLong, trial * 1000L + i,
          s, s + rnd.nextInt(20).toLong)
      }
      val (a, b) = (gen(60), gen(60))
      assert(sweep(a, b) == naive(a, b), s"trial $trial")
    }
  }

  test("keyless (AllTuples) mode matches naive on one partition") {
    val rnd = new scala.util.Random(7)
    def gen(n: Int) = (1 to n).map { i =>
      val s = rnd.nextInt(50).toLong
      (0L, i.toLong, s, s + rnd.nextInt(10).toLong)
    }
    val (a, b) = (gen(40), gen(40))
    assert(sweep(a, b, keyed = false) == naive(a, b))
  }

  test("eviction: a right that dies before a later left never matches") {
    val a = Seq((1L, 1L, 0L, 5L), (1L, 2L, 10L, 20L))
    val b = Seq((1L, 10L, 0L, 4L), (1L, 11L, 12L, 13L))
    // right 10 overlaps left 1 only; right 11 overlaps left 2 only
    assert(sweep(a, b) == Set((1L, 10L), (2L, 11L)))
  }

  test("touching endpoints overlap (closed intervals)") {
    val a = Seq((1L, 1L, 0L, 5L))
    val b = Seq((1L, 10L, 5L, 9L), (1L, 11L, 6L, 9L))
    assert(sweep(a, b) == Set((1L, 10L)))
  }

  test("key change clears the active buffer") {
    val a = Seq((1L, 1L, 0L, 100L), (2L, 2L, 0L, 100L))
    val b = Seq((1L, 10L, 0L, 100L))
    assert(sweep(a, b) == Set((1L, 10L)))
  }

  test("empty sides produce empty output") {
    val a = Seq((1L, 1L, 0L, 5L))
    assert(sweep(a, Nil) == Set.empty)
    assert(sweep(Nil, a) == Set.empty)
  }
}
