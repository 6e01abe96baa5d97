package graft.operators

import graft.{Registry, SparkSpec}

/** Calendar alignment guards and chi-square sanity. */
class GrowthSpec extends SparkSpec {

  test("growth rows: ppm arithmetic and gap-month NULL guard") {
    val rows = Registry.byName("w17_mom_yoy_growth")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    val byKey = rows.map(r => (r.getString(0),
      r.getLong(1) * 12 + r.getLong(2)) -> r).toMap
    rows.foreach { r =>
      val key = r.getString(0); val mnum = r.getLong(1) * 12 + r.getLong(2)
      val momIdx = r.fieldIndex("mom_growth_ppm")
      byKey.get(key -> (mnum - 1)) match {
        case Some(prev) if !r.isNullAt(momIdx) =>
          val expect = 1000000L * (r.getLong(3) - prev.getLong(3)) /
            prev.getLong(3)
          assert(r.getLong(momIdx) == expect)
        case None => assert(r.isNullAt(momIdx)) // gap month → NULL
        case _ => ()
      }
    }
  }

  test("chi-square: statistic non-negative, dof = (r-1)(c-1)") {
    val r = Registry.byName("a42_chisq_independence")
      .run(spark, sf("sf0.001")).collect().head
    assert(r.getDouble(0) >= 0.0)
    assert(r.getLong(1) == 4L * 2L) // 5 priorities × 3 statuses
  }

  test("chi-square is zero on a perfectly independent table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // uniform 2×2 with identical margins → obs == exp everywhere
    val cells = Seq(("a", "x", 10L), ("a", "y", 10L),
      ("b", "x", 10L), ("b", "y", 10L))
      .flatMap { case (p, s, n) => Seq.fill(n.toInt)((p, s)) }
      .toDF("o_orderpriority", "o_orderstatus")
    val dir = java.nio.file.Files.createTempDirectory("chisq").toString
    cells.withColumn("o_orderkey", monotonically_increasing_id())
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderdate",
        lit("2024-01-01").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Registry.byName("a42_chisq_independence")
      .run(spark, dir).collect().head
    assert(r.getDouble(0) == 0.0)
    assert(r.getLong(1) == 1L)
  }
}
