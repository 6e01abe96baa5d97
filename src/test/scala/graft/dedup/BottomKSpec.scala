package graft.dedup

import org.apache.spark.sql.functions._

/** Bottom-k sketch: mergeability and estimator accuracy. */
class BottomKSpec extends graft.SparkSpec {
  import spark.implicits._

  test("bottom-k of union == bottom-k of merged per-shard bottom-ks") {
    // two overlapping hash sets, deliberately including extreme values
    // (unsigned order: Long.MinValue sorts HIGH, not low)
    val a = (1L to 400L).map(_ * 7919L) :+ Long.MaxValue
    val b = (200L to 600L).map(_ * 7919L) :+ Long.MinValue
    val hashed = (a.map(h => (0, h)) ++ b.map(h => (1, h)))
      .toDF("corpus", "h").distinct()
    val k = 32
    val bk = BottomK.corpusBottomK(hashed, k)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // reference: straight unsigned sort per corpus
    def ref(xs: Seq[Long]) =
      xs.distinct.sortBy(_ ^ Long.MinValue).take(k).toSet
    assert(bk.filter(_._1 == 0).map(_._2).toSet == ref(a))
    assert(bk.filter(_._1 == 1).map(_._2).toSet == ref(b))
    // mergeability: bottom-k of (bkA ∪ bkB) == bottom-k of (A ∪ B)
    val mergedOfSketches = (ref(a) ++ ref(b)).toSeq
      .sortBy(_ ^ Long.MinValue).take(k).toSet
    assert(mergedOfSketches == ref(a ++ b))
    // Long.MinValue is unsigned-LARGEST: must not appear in any sketch
    assert(!bk.map(_._2).contains(Long.MinValue))
  }

  test("registered estimate lands near the exact Jaccard") {
    val r = graft.Registry.byName("t_corpus_resemblance")
      .run(spark, sf("sf0.001")).collect().head
    val (k, mk, jEst, jExact) =
      (r.getInt(0), r.getLong(1), r.getDouble(3), r.getDouble(4))
    assert(mk <= k && mk > 0)
    // bottom-k estimator stderr ≈ sqrt(J(1-J)/k) ≲ 0.032 at k=256;
    // allow 4 sigma
    assert(math.abs(jEst - jExact) < 0.13, s"est=$jEst exact=$jExact")
  }
}
