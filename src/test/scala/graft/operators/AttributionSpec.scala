package graft.operators

import org.apache.spark.sql.functions._

/** Attribution models on a hand-built event stream. */
class AttributionSpec extends graft.SparkSpec {
  import spark.implicits._

  test("first/last/linear credits on a known touch sequence") {
    // user 1: view(d1) → click(d2) → purchase(d3): first=view, last=click,
    //         linear 0.5/0.5
    // user 2: click(d1) → purchase(d2): all credit to click
    // user 3: purchase with NO touches in window → contributes nothing
    // user 4: view 30 days before purchase → outside the 7-day lookback
    val rows = Seq(
      (10L, "2024-03-01 10:00:00", 1L, "view"),
      (11L, "2024-03-02 10:00:00", 1L, "click"),
      (12L, "2024-03-03 10:00:00", 1L, "purchase"),
      (20L, "2024-03-01 10:00:00", 2L, "click"),
      (21L, "2024-03-02 10:00:00", 2L, "purchase"),
      (30L, "2024-03-05 10:00:00", 3L, "purchase"),
      (40L, "2024-02-01 10:00:00", 4L, "view"),
      (41L, "2024-03-02 10:00:00", 4L, "purchase"),
    )
    val tmp = java.nio.file.Files.createTempDirectory("attr").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.Registry.byName("e_attribution").run(spark, tmp)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got("view") == ((1L, 0L, 0.5)))
    assert(got("click") == ((1L, 2L, 1.5)))
    assert(!got.contains("purchase"))
  }
}
