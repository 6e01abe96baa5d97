package graft.operators

import graft.SparkSpec

/** The breakdown property Theil–Sen exists for: one wild outlier day
  * must not drag the slope, where OLS would follow it.
  */
class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  test("pairwise-median slope shrugs off a planted spike day") {
    val dir = java.nio.file.Files.createTempDirectory("ts2").toString
    // y = 10 + 2t for t = 1..20, except day 10 spikes to 400
    val rows = (1 to 20).flatMap { t =>
      val n = if (t == 10) 400 else 10 + 2 * t
      (1 to n).map { i =>
        (t * 1000L + i,
          java.sql.Timestamp.valueOf(f"2024-01-$t%02d 12:00:00"),
          i.toLong, "click", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val r = graft.Registry.byName("a35_theilsen_trend").run(spark, dir)
      .collect().head
    val (nDays, nPairs, slope, intercept) =
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    assert(nDays == 20 && nPairs == 190)
    assert(math.abs(slope - 2.0) < 0.2, s"robust slope $slope vs 2")
    // x is rebased to the series start: x = 0 at t = 1 where y = 12
    assert(math.abs(intercept - 12.0) < 2.0, s"intercept $intercept vs 12")
  }
}
