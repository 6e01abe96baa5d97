package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 34. */
class Round5Batch34Spec extends SparkSpec {

  test("oaxaca-blinder: decomposition identity and direct OLS recompute") {
    val t = graft.Tables(spark, sf("sf0.001"))
    val items = t.lineitem.groupBy("l_orderkey")
      .agg(count(lit(1)).as("x"))
    val base = t.orders
      .join(t.customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .select(col("c_mktsegment"), col("x").cast("double"),
        col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def fit(g: Array[(Double, Double)]): (Double, Double, Double, Double) = {
      val n = g.length.toDouble
      val sx = g.map(_._1).sum; val sy = g.map(_._2).sum
      val sxy = g.map(p => p._1 * p._2).sum
      val sxx = g.map(p => p._1 * p._1).sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      (a, b, sx / n, sy / n)
    }
    val (aa, ba, xa, ya) = fit(base.filter(_._1 == "BUILDING")
      .map(p => (p._2, p._3)))
    val (ab, bb, xb, yb) = fit(base.filter(_._1 == "MACHINERY")
      .map(p => (p._2, p._3)))
    val got = Registry.byName("a98_oaxaca_blinder")
      .run(spark, sf("sf0.001")).collect().head
    val gap = got.getAs[Double]("gap")
    val exp = got.getAs[Double]("explained")
    val unexp = got.getAs[Double]("unexplained")
    assert(math.abs(gap - (ya - yb)) < 1e-2)
    assert(math.abs(exp - (xa - xb) * bb) < 1e-2)
    assert(math.abs(unexp - (xa * (ba - bb) + (aa - ab))) < 1e-2)
    // the two-fold decomposition must reassemble the gap exactly
    assert(math.abs(gap - (exp + unexp)) < 1e-4,
      s"gap $gap != explained $exp + unexplained $unexp")
    assert(math.abs(got.getAs[Double]("beta_a") - ba) < 1e-3)
    assert(math.abs(got.getAs[Double]("beta_b") - bb) < 1e-3)
  }

  test("null-safe join: the N population lands on the NULL dim row") {
    val got = Registry.byName("j26_null_safe_join")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val flags = graft.Tables(spark, sf("sf0.001")).lineitem
      .groupBy("l_returnflag").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("accepted") == flags("A"))
    assert(got("returned") == flags("R"))
    assert(got("neutral") == flags("N"),
      "NULL keys must match the NULL dim row exactly once")
    assert(got.values.sum == flags.values.sum, "no rows dropped")
  }
}
