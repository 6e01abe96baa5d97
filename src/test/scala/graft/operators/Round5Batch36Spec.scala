package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for batch 36. */
class Round5Batch36Spec extends SparkSpec {

  test("url dedup: every crawl pair collapses onto one canonical group") {
    val nDocs = graft.Tables(spark, sf("sf0.001")).documents.count()
    val got = Registry.byName("d_url_dedup_groups")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[String]("canonical"), r.getAs[Long]("group_size"),
        r.getAs[Long]("exemplar")))
    // fixture: docs (2k, 2k+1) share a page — exactly nDocs/2 groups of 2
    assert(got.length == nDocs / 2, s"${got.length} groups for $nDocs docs")
    got.foreach { case (c, size, ex) =>
      assert(size == 2, s"$c size $size")
      assert(ex % 2 == 0, s"exemplar must be the even (min) doc id: $ex")
      assert(!c.contains("utm_") && !c.contains("#"), c)
    }
  }

  test("seasonal indices: weighted mean of indices is 1; direct recompute") {
    val daily = graft.Tables(spark, sf("sf0.001")).orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(month(col("day")), col("y")).collect()
      .map(r => (r.getInt(0), r.getLong(1).toDouble))
    val grand = daily.map(_._2).sum / daily.length
    val got = Registry.byName("w32_seasonal_indices")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("month"), r.getAs[Long]("n_days"),
        r.getAs[Double]("seasonal_index")))
    assert(got.length == 12)
    got.foreach { case (m, nd, idx) =>
      val g = daily.filter(_._1 == m)
      assert(nd == g.length)
      assert(math.abs(idx - (g.map(_._2).sum / g.length) / grand) < 1e-5,
        s"month $m")
    }
    // day-weighted mean of indices must be exactly 1
    val weighted = got.map { case (_, nd, idx) => nd * idx }.sum /
      got.map(_._2).sum
    assert(math.abs(weighted - 1.0) < 1e-4, s"weighted mean $weighted")
  }
}
