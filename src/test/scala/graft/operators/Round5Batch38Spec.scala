package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 38. */
class Round5Batch38Spec extends SparkSpec {

  test("conductance: matches direct cut/volume recompute") {
    val t = graft.Tables(spark, sf("sf0.001"))
    val edges = t.lineitem.select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
      .flatMap { g =>
        val ks = g.map(_._2).toSeq
        for { a <- ks; b <- ks if a < b } yield (a, b)
      }.toSet
    val community = t.supplier.select("s_suppkey", "s_nationkey")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    val m = edges.size
    val byComm = community.values.toSeq.distinct.map { c =>
      val vol = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .count(n => community(n) == c)
      val cut = edges.count(e =>
        (community(e._1) == c) != (community(e._2) == c))
      (c, vol.toLong, cut.toLong)
    }.filter(_._2 > 0).toSeq
    val got = Registry.byName("d33_conductance")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Int]("community").toLong, r.getAs[Long]("vol"),
        r.getAs[Long]("cut"), r.getAs[Double]("conductance"))).toSeq
    assert(got.length == byComm.length)
    byComm.foreach { case (c, vol, cut) =>
      val row = got.find(_._1 == c).get
      assert(row._2 == vol, s"community $c vol")
      assert(row._3 == cut, s"community $c cut")
      val phi = cut.toDouble / math.min(vol, 2L * m - vol)
      assert(math.abs(row._4 - phi) < 1e-6, s"community $c phi")
      assert(row._4 >= 0.0 && row._4 <= 1.0)
    }
  }

  test("covariance matrix: matches direct recompute; diagonal = variances") {
    val rows = graft.Tables(spark, sf("sf0.001")).lineitem
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .collect().map(r => Array(r.getDouble(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3)))
    val n = rows.length
    def cov(i: Int, j: Int): Double = {
      val mi = rows.map(_(i)).sum / n; val mj = rows.map(_(j)).sum / n
      rows.map(r => (r(i) - mi) * (r(j) - mj)).sum / (n - 1)
    }
    val got = Registry.byName("a99_covariance_matrix")
      .run(spark, sf("sf0.001")).collect()
      .map(r => ((r.getAs[Long]("i"), r.getAs[Long]("j")),
        r.getAs[Double]("cov"))).toMap
    assert(got.size == 10)
    got.keys.foreach { case (i, j) =>
      val expected = cov(i.toInt, j.toInt)
      val tol = math.max(1e-6, math.abs(expected) * 1e-6)
      assert(math.abs(got((i, j)) - expected) < tol, s"cell ($i,$j)")
    }
    // diagonal entries are variances: strictly positive
    (0 to 3).foreach(i => assert(got((i.toLong, i.toLong)) > 0.0))
  }
}
