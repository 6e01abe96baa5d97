package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 37. */
class Round5Batch37Spec extends SparkSpec {

  test("bayes ab: probabilities complement and match phi recompute") {
    val users = graft.Tables(spark, sf("sf0.001")).events
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" && col("value") > 90.0,
        1L).otherwise(0L)).as("conv"))
      .select((col("user_id") % 2).as("arm"), col("conv"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = users.filter(_._1 == 0); val b = users.filter(_._1 == 1)
    val pa = a.map(_._2).sum.toDouble / a.length
    val pb = b.map(_._2).sum.toDouble / b.length
    val z = (pb - pa) / math.sqrt(pa * (1 - pa) / a.length +
      pb * (1 - pb) / b.length)
    def phiTail(az: Double): Double = {
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val poly = ((((1.330274429 * t - 1.821255978) * t + 1.781477937) *
        t - 0.356563782) * t + 0.319381530) * t
      math.exp(-az * az / 2.0) * 0.3989422804014327 * poly
    }
    val pBbeatsA = if (z >= 0) 1.0 - phiTail(z) else phiTail(-z)
    val got = Registry.byName("e_bayes_ab_normal")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("na") == a.length)
    assert(got.getAs[Long]("nb") == b.length)
    assert(math.abs(got.getAs[Double]("z") - z) < 1e-5)
    assert(math.abs(got.getAs[Double]("p_b_beats_a") - pBbeatsA) < 1e-7)
    val sum = got.getAs[Double]("p_b_beats_a") +
      got.getAs[Double]("p_a_beats_b")
    assert(math.abs(sum - 1.0) < 1e-8, s"probabilities must complement: $sum")
  }

  test("ip cidr: boundary addresses classify correctly") {
    val got = Registry.byName("f20_ip_cidr")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("ip_num"),
        r.getAs[Boolean]("is_private"), r.getAs[Boolean]("in_192_168_1_24")))
      .sortBy(_._1)
    val byId = got.map(t => t._1 -> t).toMap
    // 10.0.0.1 and 10.255.255.255 private; 11.0.0.0 not
    assert(byId(1L)._3 && byId(2L)._3 && !byId(3L)._3)
    // 172.16.0.1 and 172.31.255.254 private; 172.32.0.1 not
    assert(byId(4L)._3 && byId(5L)._3 && !byId(6L)._3)
    // 192.168.x private; 192.169.x not; 8.8.8.8 public
    assert(byId(7L)._3 && !byId(8L)._3 && !byId(9L)._3)
    // only 192.168.1.77 sits in 192.168.1.0/24
    assert(got.filter(_._4).map(_._1).toSeq == Seq(7L))
    // uint32 arithmetic: 8.8.8.8 = 134744072
    assert(byId(9L)._2 == 134744072L)
  }
}
