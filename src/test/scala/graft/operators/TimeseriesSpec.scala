package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties the decomposition/smoothing operators exist for, pinned
  * on constructed series where the truth is known in closed form.
  */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir(rows: Seq[(String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("ts").toString
    // one event row per unit of count, at noon of the given day
    rows.flatMap { case (typ, day, n) =>
      (1L to n).map(i => (typ, day, i))
    }.zipWithIndex.map { case ((typ, day, i), id) =>
      (id.toLong, java.sql.Timestamp.valueOf(s"$day 12:00:00"), i, typ,
        1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("mase: a perfect weekly rhythm scores 0 once history covers it") {
    // 4 repetitions of a period-7 pattern: the seasonal-naive forecast
    // (lag 7) is exact from day 8 on → numerator 0 → MASE = 0, while
    // the naive lag-1 denominator sees the within-week swings
    val pattern = Seq(5L, 1L, 2L, 1L, 3L, 1L, 9L)
    val days = (0 until 28).map { t =>
      ("view", f"2024-01-${t + 1}%02d", pattern(t % 7))
    }
    val dir = eventsDir(days)
    val rows = graft.Registry.byName("e_forecast_mase")
      .run(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == 21L, s"n_days ${r.getLong(1)}") // 28 − 7
    assert(r.getLong(2) == 0L, s"seasonal err ${r.getLong(2)}")
    assert(r.getLong(3) > 0L)
    assert(r.getLong(4) == 0L, s"mase_ppm ${r.getLong(4)}")
  }

  test("time-weighted average weights each value by its holding time") {
    val dir = java.nio.file.Files.createTempDirectory("twa").toString
    import spark.implicits._
    // value 10 holds 3 s, value 20 holds 1 s → TWA = 12.5; the final
    // observation has no interval and is excluded
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 20.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:04"), 999.0),
    ).map { case (id, ts, v) => (id, ts, 1L, "tick", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.Registry.byName("w16_time_weighted_avg")
      .run(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 2L)
    assert(r.head.getLong(2) == 4000000L)
    assert(r.head.getLong(3) == 12500L, s"twa ${r.head.getLong(3)}")
  }

  test("holt tracks a linear ramp: level ≈ y, trend ≈ slope") {
    // y_t = 100 + 5·t over 25 days: after the 10-tap window fills, the
    // truncated filter's level must sit near the series and the trend
    // near the slope (truncation bias < the slope itself by far)
    val days = (1 to 25).map(t => ("click", f"2024-01-$t%02d", 100L + 5 * t))
    val dir = eventsDir(days)
    val q = graft.Registry.byName("w15_holt_linear")
    val rows = q.run(spark, dir).orderBy("day").collect()
    assert(rows.length == 25)
    val late = rows.drop(15)
    late.foreach { r =>
      val (n, level, trend) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(level - n) < 12, s"level $level vs y $n")
      assert(math.abs(trend - 5.0) < 3.5, s"trend $trend vs slope 5")
    }
    // forecast_3 = level + 3·trend exactly (same integer units)
    late.foreach { r =>
      assert(math.abs(r.getDouble(5) - (r.getDouble(3) + 3 * r.getDouble(4)))
        < 1e-9)
    }
  }

  test("holt weights: exact dyadics near unit mass, first tap = α") {
    // the complex-pair modes (|λ| = √½) make individual weights swing
    // negative; the truncated level mass sits near (not below) 1
    val sum = Timeseries.holtUnitCoefs.map(_._1).sum.toDouble / (1L << 30)
    assert(sum > 0.95 && sum < 1.10, s"truncated level mass $sum")
    // first tap is exactly α = 1/2 in 2^30 units
    assert(Timeseries.holtUnitCoefs.head._1 == (1L << 29))
  }

  test("stl recovers a pure weekly pattern: residual exactly 0") {
    // 28 days, count = 100 + 10·dow: trend (7-day MA) is the constant
    // 130, seasonal is the dow offset, residual must vanish identically
    val days = (1 to 28).map { t =>
      val day = f"2024-01-$t%02d"
      val dow = (java.time.LocalDate.parse(day).toEpochDay % 7).toInt
      ("view", day, 100L + 10 * dow)
    }
    val dir = eventsDir(days)
    val rows = graft.Registry.byName("e_stl_decompose").run(spark, dir)
      .orderBy("day").collect()
    // 28 days − 3 edge rows each side with partial windows
    assert(rows.length == 22)
    rows.foreach { r =>
      val (trend, resid) = (r.getDouble(6), r.getDouble(8))
      assert(math.abs(trend - 130.0) < 1e-9, s"trend $trend")
      assert(math.abs(resid) < 1e-9, s"residual $resid")
    }
  }

  test("holt and stl are run-to-run deterministic on real data") {
    for (name <- Seq("w15_holt_linear", "e_stl_decompose")) {
      val q = graft.Registry.byName(name)
      val a = q.run(spark, sf("sf0.001")).collect()
        .map(_.toString).sorted.toSeq
      val b = q.run(spark, sf("sf0.001")).collect()
        .map(_.toString).sorted.toSeq
      assert(a.nonEmpty && a == b, name)
    }
  }
}
