package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for batch 42. */
class Round5Batch42Spec extends SparkSpec {

  test("growth accounting: the MAU-change identity holds every month") {
    val got = Registry.byName("e_growth_accounting")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("month_idx"), r.getAs[Long]("new"),
        r.getAs[Long]("retained"), r.getAs[Long]("resurrected"),
        r.getAs[Long]("churned"), r.getAs[Long]("mau")))
      .sortBy(_._1)
    assert(got.length > 12, "multi-year span expected")
    // state decomposition: actives split exactly three ways
    got.foreach { case (m, nw, ret, res, _, mau) =>
      assert(nw + ret + res == mau, s"month $m state split")
    }
    // the accounting identity: MAU(m) = MAU(m-1) + new + res - churned
    got.sliding(2).foreach {
      case Array((m0, _, _, _, _, mau0), (m1, nw, _, res, ch, mau1))
          if m1 == m0 + 1 =>
        assert(mau1 == mau0 + nw + res - ch,
          s"identity broken at $m1: $mau0 + $nw + $res - $ch != $mau1")
      case _ =>
    }
    // first month is all-new, nothing churned into it
    val first = got.head
    assert(first._2 == first._6 && first._3 == 0 && first._4 == 0)
    // a direct MAU recompute for a mid-span month
    val um = graft.Tables(spark, sf("sf0.001")).orders
      .select(col("o_custkey"),
        (year(col("o_orderdate")).cast("long") * 12 +
          month(col("o_orderdate")).cast("long")).as("m"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = got(got.length / 2)._1
    assert(got.find(_._1 == mid).get._6 == um.count(_._2 == mid))
  }
}
