package graft.operators

import graft.{Registry, SparkSpec}

/** Hand-computed cross-checks for the batch-18 statistics: the sf
  * oracles prove engine parity; these prove the FORMULAS against
  * independently worked examples.
  */
class Round5Batch18Spec extends SparkSpec {

  test("friedman: sf0.001 statistic matches a direct Scala recompute") {
    val rows = graft.Tables(spark, sf("sf0.001")).orders
      .groupBy(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("o_orderdate"), "yyyy-MM"),
        org.apache.spark.sql.functions.col("o_orderpriority"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val k = 5
    val byBlk = rows.groupBy(_._1).filter(_._2.length == k)
    // mid-ranks per block, Conover tie-corrected T
    var a = 0.0; var sums = Map.empty[String, Double]
    val b = byBlk.size
    byBlk.values.foreach { cells =>
      val ys = cells.map(_._3).sorted
      cells.foreach { case (_, trt, y) =>
        val lt = ys.count(_ < y); val eq = ys.count(_ == y)
        val r = lt + (eq + 1) / 2.0
        a += r * r
        sums = sums.updated(trt, sums.getOrElse(trt, 0.0) + r)
      }
    }
    val c = b * k * (k + 1) * (k + 1) / 4.0
    val num = sums.values.map(r => math.pow(r - b * (k + 1) / 2.0, 2)).sum
    val expected = (k - 1) * num / (a - c)
    val got = Registry.byName("a74_friedman_test")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n_blocks") == b)
    assert(math.abs(got.getAs[Double]("chi2_f") - expected) < 1e-5,
      s"got=${got.getAs[Double]("chi2_f")} expected=$expected")
  }

  test("granger: F matches brute-force OLS residuals on sf0.001") {
    val t = graft.Tables(spark, sf("sf0.001"))
    import org.apache.spark.sql.functions._
    val y = t.orders.groupBy(to_date(col("o_orderdate")).as("day"))
      .count().collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val x = t.lineitem.groupBy(to_date(col("l_shipdate")).as("day"))
      .count().collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val days = y.keySet.intersect(x.keySet)
    val triples = days.toSeq.flatMap { d =>
      val p = d.minusDays(1)
      if (days.contains(p)) Some((y(d).toDouble, y(p).toDouble, x(p).toDouble))
      else None
    }
    def rss(ts: Seq[(Double, Array[Double])]): Double = {
      // OLS with intercept via normal equations (2 or 3 params)
      val p = ts.head._2.length + 1
      val xs = ts.map { case (_, v) => 1.0 +: v.toSeq }
      val ys = ts.map(_._1)
      val xtx = Array.ofDim[Double](p, p)
      val xty = Array.ofDim[Double](p)
      xs.zip(ys).foreach { case (row, yy) =>
        for (i <- 0 until p) {
          xty(i) += row(i) * yy
          for (j <- 0 until p) xtx(i)(j) += row(i) * row(j)
        }
      }
      // gaussian elimination
      val m = xtx.map(_.clone()); val v = xty.clone()
      for (i <- 0 until p) {
        val piv = m(i)(i)
        for (j <- i until p) m(i)(j) /= piv
        v(i) /= piv
        for (r <- 0 until p if r != i) {
          val f = m(r)(i)
          for (j <- i until p) m(r)(j) -= f * m(i)(j)
          v(r) -= f * v(i)
        }
      }
      xs.zip(ys).map { case (row, yy) =>
        val pred = row.indices.map(i => row(i) * v(i)).sum
        (yy - pred) * (yy - pred)
      }.sum
    }
    val n = triples.length
    val rssR = rss(triples.map(t3 => (t3._1, Array(t3._2))))
    val rssU = rss(triples.map(t3 => (t3._1, Array(t3._2, t3._3))))
    val expected = (rssR - rssU) / (rssU / (n - 3))
    val got = Registry.byName("a78_granger_f").run(spark, sf("sf0.001"))
      .collect().find(_.getString(0) == "x_to_y").get
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("f_stat") - expected) < 1e-4,
      s"got=${got.getAs[Double]("f_stat")} expected=$expected")
  }

  test("kappa bounds and identity-rater sanity") {
    val r = Registry.byName("a75_cohens_kappa").run(spark, sf("sf0.001"))
      .collect().head
    val kappa = r.getAs[Long]("kappa_ppm")
    assert(kappa > -1000000L && kappa <= 1000000L)
    val po = r.getAs[Long]("po_ppm"); val pe = r.getAs[Long]("pe_ppm")
    assert(po >= 0 && po <= 1000000L && pe > 0 && pe < 1000000L)
  }

  test("ccf: lag 0 equals pearson corr of the joined spines") {
    import org.apache.spark.sql.functions._
    val t = graft.Tables(spark, sf("sf0.001"))
    val joined = t.orders.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"))
      .join(t.lineitem.groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(count(lit(1)).as("y")), "day")
    val expected = joined.agg(
      corr(col("x").cast("double"), col("y").cast("double"))).head().getDouble(0)
    val got = Registry.byName("w27_ccf_lags").run(spark, sf("sf0.001"))
      .collect().find(_.getAs[Int]("lag") == 0).get.getAs[Double]("ccf")
    assert(math.abs(got - expected) < 1e-5)
  }

  test("psi: identical halves would give ~0; split halves stay small and finite") {
    val rows = Registry.byName("a77_psi_drift").run(spark, sf("sf0.001"))
      .collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val total = rows.head.getAs[Double]("psi_total")
    assert(!total.isNaN && !total.isInfinite)
    assert(rows.map(_.getAs[Double]("psi_term")).forall(v => !v.isNaN))
  }

  test("power-user curve: shares sum to the user base, at_least is monotone") {
    val rows = Registry.byName("e_power_user_curve")
      .run(spark, sf("sf0.001")).collect()
      .sortBy(_.getAs[Long]("active_days"))
    val total = rows.map(_.getAs[Long]("n_users")).sum
    assert(rows.last.getAs[Long]("active_days") <= 28)
    // at_least descending as active_days ascends, topped by the total
    val al = rows.map(_.getAs[Long]("at_least"))
    assert(al.zip(al.drop(1)).forall { case (a2, b2) => a2 >= b2 })
    assert(al.head <= total && al.last >= 1)
  }
}
