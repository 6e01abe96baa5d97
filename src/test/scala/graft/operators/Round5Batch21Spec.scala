package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and recomputes for batch 21. */
class Round5Batch21Spec extends SparkSpec {

  test("markov stationary: sums to 1 and is a fixed point of P") {
    val pi = Registry.byName("e_markov_stationary")
      .run(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pi.values.sum - 1.0) < 1e-6)
    // rebuild P directly and check ||piP - pi|| is tiny (converged)
    val ev = graft.Tables(spark, sf("sf0.001")).events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.sql.Timestamp](2), r.getLong(3)))
    val trans = ev.groupBy(_._1).values.flatMap { rs =>
      val sorted = rs.sortBy(r => (r._3.getTime, r._4))
      sorted.zip(sorted.drop(1)).map { case (a, b) => (a._2, b._2) }
    }.groupBy(identity).map { case (k, l) => k -> l.size.toDouble }
    val rowTot = trans.groupBy(_._1._1).map { case (s0, m) =>
      s0 -> m.values.sum }
    val next = pi.keys.map { dst =>
      dst -> pi.keys.map { src =>
        pi(src) * trans.getOrElse((src, dst), 0.0) / rowTot(src)
      }.sum
    }.toMap
    pi.keys.foreach { s0 =>
      assert(math.abs(next(s0) - pi(s0)) < 1e-6, s"state $s0 not fixed")
    }
  }

  test("query likelihood: matches brute per-doc scoring") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val terms = Seq("spark", "join")
    val mu = 2000.0
    val clen = docs.map(_._2.length.toDouble).sum
    val cf = terms.map(t =>
      t -> docs.map(_._2.count(_ == t).toDouble).sum).toMap
    val scored = docs.map { case (id, w) =>
      val dl = w.length.toDouble
      val s0 = terms.map { t =>
        val p = (cf(t) + 1.0) / (clen + 1.0)
        math.log((w.count(_ == t) + mu * p) / (dl + mu))
      }.sum
      (id, math.rint(s0 * 1e4) / 1e4)
    }.sortBy { case (id, s0) => (-s0, id) }.take(20)
    val got = Registry.byName("t_ql_dirichlet_topk")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(got.map(_._1).toSeq == scored.map(_._1).toSeq)
    got.zip(scored).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9) }
  }

  test("poisson rates: exposures partition the calendar") {
    val r = Registry.byName("a85_poisson_rates")
      .run(spark, sf("sf0.001")).collect().head
    val d1 = r.getAs[Long]("d1"); val d2 = r.getAs[Long]("d2")
    val span = graft.Tables(spark, sf("sf0.001")).events
      .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts")))))
      .head().getInt(0)
    assert(d1 + d2 == span + 1)
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("tokenizer fertility: ratios consistent with the sums") {
    val rows = Registry.byName("t_tokenizer_fertility")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Double]("fertility")
      val expected = r.getAs[Long]("toks").toDouble /
        r.getAs[Long]("words").toDouble
      assert(math.abs(f - expected) < 1e-5)
      assert(f > 0)
    }
  }
}
