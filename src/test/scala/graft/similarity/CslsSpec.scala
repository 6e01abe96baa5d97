package graft.similarity

import graft.{Registry, SparkSpec}

/** Invariants for the CSLS re-ranking row. */
class CslsSpec extends SparkSpec {

  test("csls: hubness penalty recompute and rank sanity") {
    val dir = sf("sf0.001")
    val e = graft.Tables(spark, dir).embeddings.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      math.rint(d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)) * 1e4) / 1e4
    }
    val vecs = e.toMap
    val ids = vecs.keys.toSeq.sorted
    val r = ids.map { x =>
      val top = ids.filter(_ != x)
        .map(y => (cos(vecs(x), vecs(y)), y))
        .sortBy(t => (-t._1, t._2)).take(Csls.K).map(_._1)
      x -> top.sum / Csls.K
    }.toMap
    val got = Registry.byName("sim_csls_rerank")
      .run(spark, dir).collect()
      .map(row => (row.getAs[Long]("query_id"),
        row.getAs[Long]("neighbor_id"), row.getAs[Double]("csls"),
        row.getAs[Int]("rn")))
    assert(got.nonEmpty)
    got.foreach { case (q, n, score, _) =>
      val expected = 2.0 * cos(vecs(q), vecs(n)) - r(q) - r(n)
      assert(math.abs(score - expected) < 1e-4, s"($q,$n)")
    }
    // per query: exactly TopK rows, ranks dense, scores non-increasing
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.length == Csls.TopK)
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to Csls.TopK))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3; case _ => true })
    }
  }

  test("sampled fleet-scale form agrees with the exact form at top-1") {
    // the gate the scale path must pass to replace the exact r(·): the
    // sampled penalty may move low ranks, but the top neighbour should
    // survive for (nearly) every query — measured 9/10 on this fixture
    // at SampleMod = 2, gated at ≥ 0.8 so a real estimator regression
    // (like the label-blocked variant's 0/10, measured and rejected)
    // fails loudly without pinning RNG-free-but-fragile exactness
    val dir = sf("sf0.001")
    def top1(name: String): Map[Long, Long] =
      Registry.byName(name).run(spark, dir).collect()
        .filter(_.getAs[Int]("rn") == 1)
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
        .toMap
    val exact = top1("sim_csls_rerank")
    val sampled = top1("sim_csls_rerank_sampled")
    assert(sampled.nonEmpty && sampled.keySet == exact.keySet)
    val agree = sampled.count { case (q, n) => exact.get(q).contains(n) }
    assert(agree >= 0.8 * sampled.size,
      s"top-1 agreement only $agree/${sampled.size}")
  }
}
