package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 25. */
class Round5Batch25Spec extends SparkSpec {

  test("gini: matches direct sorted-rank recompute") {
    val revs = graft.Tables(spark, sf("sf0.001")).orders
      .groupBy("o_custkey").agg(sum("o_totalprice").as("rev"))
      .collect().map(r => BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble).sorted
    val n = revs.length
    val t = revs.sum
    val srank = revs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val gini = 2.0 * srank / (n * t) - (n + 1).toDouble / n
    val got = Registry.byName("a90_gini_revenue")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("gini") - gini) < 1e-5,
      s"got=${got.getAs[Double]("gini")} expected=$gini")
    assert(got.getAs[Double]("gini") > 0.0 && got.getAs[Double]("gini") < 1.0)
  }

  test("logrank: matches direct at-risk table recompute") {
    val users = graft.Tables(spark, sf("sf0.001")).events
      .select(col("user_id"), col("ts").cast("date").as("day"),
        col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(min(col("day")).as("fd"), max(col("day")).as("ld"),
        min(when(col("event_type") === "purchase" && col("value") > 90.0,
          col("day"))).as("cd"))
      .select(datediff(coalesce(col("cd"), col("ld")), col("fd"))
        .cast("long").as("dur"),
        when(col("cd").isNotNull, 1L).otherwise(0L).as("event"),
        (col("user_id") % 2).as("arm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val durs = users.map(_._1).distinct.sorted
    var o1 = 0L; var e1 = 0.0; var v = 0.0
    durs.foreach { t =>
      val atRisk = users.filter(_._1 >= t)
      val nAll = atRisk.length.toDouble
      val n1 = atRisk.count(_._3 == 1).toDouble
      val dAll = atRisk.filter(_._1 == t).map(_._2).sum.toDouble
      val d1 = atRisk.filter(u => u._1 == t && u._3 == 1).map(_._2).sum
      if (dAll > 0 && nAll > 1) {
        o1 += d1
        e1 += dAll * n1 / nAll
        v += dAll * (n1 / nAll) * (1.0 - n1 / nAll) * (nAll - dAll) /
          (nAll - 1.0)
      }
    }
    val chi2 = (o1 - e1) * (o1 - e1) / v
    val got = Registry.byName("e_logrank_test")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("o1") == o1)
    assert(math.abs(got.getAs[Double]("e1") - e1) < 1e-5)
    assert(math.abs(got.getAs[Double]("v") - v) < 1e-5)
    assert(math.abs(got.getAs[Double]("chi2") - chi2) < 1e-4,
      s"got=${got.getAs[Double]("chi2")} expected=$chi2")
  }

  test("parquet bloom roundtrip: probe equals direct filter; bloom metadata written") {
    val got = Registry.byName("s37_parquet_bloom_roundtrip")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val direct = graft.Tables(spark, sf("sf0.001")).part
      .filter(col("p_partkey").isin(17L, 4242L, 9999L, 12345L, 19997L))
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.nonEmpty && got.sameElements(direct))
  }
}
