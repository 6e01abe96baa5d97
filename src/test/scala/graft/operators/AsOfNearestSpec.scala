package graft.operators

import graft.{Registry, SparkSpec}

/** Nearest as-of (composed backward+forward) and stock-flow. */
class AsOfNearestSpec extends SparkSpec {
  import spark.implicits._

  private def run(events: Seq[(Long, Int, Long, String)])
      : Map[Long, (Long, Long)] = {
    import java.sql.Timestamp
    val df = events.map { case (id, minute, user, typ) =>
      (id, Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), user, typ,
        0d, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("nst").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Registry.byName("j12e_asof_nearest").run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
  }

  test("closest purchase wins in either direction; ties go backward") {
    val got = run(Seq(
      (1L, 10, 1L, "view"),
      (2L, 3, 1L, "purchase"),   // 7 min before
      (3L, 12, 1L, "purchase"),  // 2 min after: closer → picked
      (4L, 30, 2L, "view"),
      (5L, 25, 2L, "purchase"),  // 5 min before
      (6L, 35, 2L, "purchase"),  // 5 min after: tie → backward wins
      (7L, 50, 3L, "view"),
      (8L, 40, 3L, "purchase"))) // only backward exists
    assert(got(1L) == ((3L, 120000000L)))
    assert(got(4L) == ((5L, 300000000L)))
    assert(got(7L) == ((8L, 600000000L)))
  }

  test("forward-only users still match") {
    val got = run(Seq((1L, 5, 1L, "view"), (2L, 9, 1L, "purchase")))
    assert(got(1L) == ((2L, 240000000L)))
  }
}

class StockFlowSpec extends SparkSpec {
  import spark.implicits._

  test("entries minus exits nets to the sliding stock") {
    val dir = java.nio.file.Files.createTempDirectory("sfl").toString
    // two ads in week of 2024-01-01 (a Monday), one 3 weeks later
    Seq((1L, "2024-01-01"), (2L, "2024-01-03"), (3L, "2024-01-22"))
      .toDF("o_orderkey", "d")
      .withColumn("o_orderdate", org.apache.spark.sql.functions
        .to_date(org.apache.spark.sql.functions.col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Registry.byName("w24_stock_flow").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val weeks = got.keys.toSeq.sorted
    assert(got(weeks.head) == ((2L, 0L, 2L)))       // both enter
    assert(got(weeks(1)) == ((1L, 0L, 3L)))         // third enters
    // first two exit 43 days after posting; stock ends at zero
    assert(got(weeks.last)._3 == 0L)
    assert(got.values.map(_._1).sum == got.values.map(_._2).sum)
  }
}
