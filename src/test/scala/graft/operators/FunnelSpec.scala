package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Conversion-funnel semantics on crafted event streams: strict
  * ordering, per-step conversion window, and stage attribution.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runFunnel(events: Seq[(Long, Timestamp, Long, String)]) = {
    val tmp = java.nio.file.Files.createTempDirectory("funnel").toString
    events.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    graft.Registry.byName("e_funnel_steps").run(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))
      .toMap
  }

  test("stages attribute by ordered steps inside the conversion window") {
    val got = runFunnel(Seq(
      // user 1: full funnel inside the window → stage 3
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 01:00:00"), 1L, "click"),
      (3L, ts("2024-01-01 02:00:00"), 1L, "purchase"),
      // user 2: click lands 13h after the first view → stage 1
      (4L, ts("2024-01-01 00:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 13:00:00"), 2L, "click"),
      // user 3: click precedes the only view → never converts past 1
      (6L, ts("2024-01-01 00:00:00"), 3L, "click"),
      (7L, ts("2024-01-01 01:00:00"), 3L, "view"),
      // user 4: purchase outside the click window → stage 2
      (8L, ts("2024-01-01 00:00:00"), 4L, "view"),
      (9L, ts("2024-01-01 01:00:00"), 4L, "click"),
      (10L, ts("2024-01-01 14:30:00"), 4L, "purchase"),
      // user 5: purchase with no view at all → stage 0
      (11L, ts("2024-01-01 00:00:00"), 5L, "purchase"),
    ))
    assert(got(1L)._4 == 3)
    assert(got(2L)._4 == 1 && got(2L)._2.isEmpty)
    assert(got(3L)._4 == 1)
    assert(got(4L)._4 == 2 && got(4L)._3.isEmpty)
    assert(got(5L)._4 == 0 && got(5L)._1.isEmpty)
    // micros are real epoch values and strictly ordered along the funnel
    val (v, c, p, _) = got(1L)
    assert(v.get.asInstanceOf[Long] < c.get.asInstanceOf[Long] &&
      c.get.asInstanceOf[Long] < p.get.asInstanceOf[Long])
  }

  test("first qualifying event wins each step") {
    val got = runFunnel(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 00:30:00"), 1L, "click"),
      (3L, ts("2024-01-01 00:45:00"), 1L, "click"), // later click ignored
      (4L, ts("2024-01-01 01:00:00"), 1L, "purchase"),
    ))
    val clickUs = got(1L)._2.get.asInstanceOf[Long]
    assert(clickUs == ts("2024-01-01 00:30:00").getTime * 1000)
    assert(got(1L)._4 == 3)
  }
}
