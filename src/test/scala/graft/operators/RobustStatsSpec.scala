package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The property MAD exists for: the scale estimate ignores the
  * contaminating outliers themselves (50% breakdown), where a stddev
  * fence would be dragged by them. Plus the windowed-HLL merge law on
  * a fixture where exact counts are known.
  */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("MAD flags planted spikes and is not dragged by them") {
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    // 100 well-behaved points around 10 ± 2, plus 5 spikes at 1000
    val vals = (1 to 100).map(i => 10.0 + (i % 5) - 2) ++
      Seq.fill(5)(1000.0)
    vals.zipWithIndex.map { case (v, i) => (i.toLong, "t", v) }
      .toDF("event_id", "event_type", "value")
      .withColumn("ts", lit(0L)).withColumn("user_id", lit(1L))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val q = graft.Registry.all.find(_.name == "a30_mad_outliers").get
    val r = q.run(spark, dir).collect().head
    val (med, mad, n, out) =
      (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))
    assert(n == 105)
    assert(med >= 9 && med <= 11, s"median $med robust to spikes")
    assert(mad <= 2.5, s"MAD $mad reflects the clean spread")
    assert(out == 5, s"exactly the spikes are flagged, got $out")
  }

  test("windowed HLL: merged weekly registers equal the global sketch") {
    val q = graft.Registry.all.find(_.name == "w13_windowed_hll").get
    val rows = q.run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val all = rows.filter(_._1 == "all")
    assert(all.length == 1)
    // estimate within the ±5% envelope the 512-register layout pins
    val (_, approx, exact) = all.head
    assert(math.abs(approx - exact) <= 0.05 * exact,
      s"approx $approx vs exact $exact")
    assert(rows.count(_._1.startsWith("w:")) > 50, "weekly grain present")
  }
}
