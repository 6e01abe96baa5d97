package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 28. */
class Round5Batch28Spec extends SparkSpec {

  private def armedValues: Array[(Long, Double)] =
    graft.Tables(spark, sf("sf0.001")).events
      .select((col("user_id") % 2).as("arm"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))

  test("qte: matches direct nearest-rank per-arm quantiles") {
    val rows = armedValues
    def quantile(xs: Array[Double], q: Int): Double = {
      val sorted = xs.map(v => math.round(v * 100)).sorted
      val idx = (q.toLong * sorted.length + 99) / 100
      sorted(idx.toInt - 1) / 100.0
    }
    val c = rows.filter(_._1 == 0).map(_._2)
    val t = rows.filter(_._1 == 1).map(_._2)
    val got = Registry.byName("e_quantile_treatment_effect")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("quantile_pct"), r.getAs[Double]("v_control"),
        r.getAs[Double]("v_treatment"), r.getAs[Double]("qte")))
      .sortBy(_._1)
    assert(got.length == 9)
    got.foreach { case (q, v0, v1, qte) =>
      assert(math.abs(v0 - quantile(c, q.toInt)) < 1e-9, s"q=$q control")
      assert(math.abs(v1 - quantile(t, q.toInt)) < 1e-9, s"q=$q treatment")
      assert(math.abs(qte - (v1 - v0)) < 1e-9)
    }
  }

  test("effect size: matches direct pooled-sd recompute") {
    val rows = armedValues
    val a0 = rows.filter(_._1 == 0).map(_._2)
    val a1 = rows.filter(_._1 == 1).map(_._2)
    def meanVar(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (m0, v0) = meanVar(a0); val (m1, v1) = meanVar(a1)
    val df = a0.length + a1.length - 2
    val sp = math.sqrt(((a0.length - 1) * v0 + (a1.length - 1) * v1) / df)
    val dd = (m1 - m0) / sp
    val g = (1.0 - 3.0 / (4.0 * df - 1.0)) * dd
    val got = Registry.byName("a93_effect_size")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n0") == a0.length)
    assert(got.getAs[Long]("n1") == a1.length)
    assert(math.abs(got.getAs[Double]("cohens_d") - dd) < 1e-5)
    assert(math.abs(got.getAs[Double]("hedges_g") - g) < 1e-5)
    assert(math.abs(got.getAs[Double]("pooled_sd") - sp) < 1e-4)
  }

  test("power-law alpha: matches direct CSN MLE recompute") {
    val counts = graft.Tables(spark, sf("sf0.001")).documents
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect().map(_.getLong(1))
    val tail = counts.filter(_ >= 2L)
    val sln = tail.map(c => math.log(c / 1.5)).sum
    val alpha = 1.0 + tail.length / sln
    val got = Registry.byName("t_powerlaw_alpha")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n_vocab") == counts.length)
    assert(got.getAs[Long]("n_tail") == tail.length)
    assert(math.abs(got.getAs[Double]("alpha") - alpha) < 1e-5)
    assert(got.getAs[Double]("alpha") > 1.0)
    assert(got.getAs[Double]("se") > 0.0)
  }
}
