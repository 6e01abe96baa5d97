package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 31. */
class Round5Batch31Spec extends SparkSpec {

  test("dynamic partition overwrite: only the en slice changes") {
    val before = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), col("n_chars"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val got = Registry.byName("s38_dynamic_partition_overwrite")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.length == before.length, "row count preserved")
    val byId = before.map(t => t._1 -> t).toMap
    got.foreach { case (id, nc, lang) =>
      val (_, nc0, lang0) = byId(id)
      assert(lang == lang0)
      if (lang == "en") assert(nc == nc0 * 2, s"doc $id en not rewritten")
      else assert(nc == nc0, s"doc $id ($lang) was touched")
    }
    assert(got.exists(_._3 == "en") && got.exists(_._3 != "en"))
  }

  test("p-chart: limits match binomial recompute; flags consistent") {
    val daily = graft.Tables(spark, sf("sf0.001")).events
      .groupBy(col("ts").cast("date"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("e"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val pbar = daily.map(_._2).sum.toDouble / daily.map(_._1).sum
    val got = Registry.byName("w31_p_chart")
      .run(spark, sf("sf0.001")).collect()
    assert(got.length == daily.length)
    got.foreach { r =>
      val n = r.getAs[Long]("n")
      val se = math.sqrt(pbar * (1 - pbar) / n)
      assert(math.abs(r.getAs[Double]("p_bar") - pbar) < 1e-6)
      assert(math.abs(r.getAs[Double]("ucl") - (pbar + 3 * se)) < 1e-5)
      assert(math.abs(r.getAs[Double]("lcl") -
        math.max(0.0, pbar - 3 * se)) < 1e-5)
      val p = r.getAs[Double]("p")
      val expectFlag = p > pbar + 3 * se || p < math.max(0.0, pbar - 3 * se)
      assert(r.getAs[Boolean]("out_of_control") == expectFlag)
    }
  }

  test("script detection: each fixture row lands on its script") {
    val got = Registry.byName("t_script_detection")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("dominant"))).toMap
    assert(got(1L) == "latin")
    assert(got(2L) == "cyrillic")
    assert(got(3L) == "greek")
    assert(got(4L) == "cjk")
    assert(got(5L) == "cyrillic" || got(5L) == "latin") // mixed row
    // mixed row counts both scripts
    val mixed = Registry.byName("t_script_detection")
      .run(spark, sf("sf0.001")).filter(col("id") === 5).collect().head
    assert(mixed.getAs[Long]("n_latin") > 0 &&
      mixed.getAs[Long]("n_cyrillic") > 0)
  }
}
