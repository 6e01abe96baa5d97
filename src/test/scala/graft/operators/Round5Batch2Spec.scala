package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Jaro–Winkler expression vs hand-computed classics. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def sim(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(graft.functions.JaroWinkler.jaro_winkler(col("a"), col("b")))
      .head().getDouble(0)

  test("the textbook values") {
    assert(math.abs(sim("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(sim("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-9)
    assert(sim("abc", "abc") == 1.0)
    assert(sim("ab", "ba") == 0.0)  // window 0: no matches
    assert(sim("", "") == 1.0)
    assert(sim("a", "") == 0.0)
  }

  test("no prefix boost below the 0.7 jaro threshold") {
    val j = sim("abcdzzzzzzzzzzzz", "abcdyyyyyyyyyyyy")
    assert(j == 0.5)  // boost would lift it to 0.7; threshold forbids
  }

  test("interpreted and codegen paths agree") {
    val df = Seq(("kitten", "sitting")).toDF("a", "b")
      .select(graft.functions.JaroWinkler.jaro_winkler(col("a"), col("b"))
        .as("s"))
    val s = df.head().getDouble(0)
    assert(math.abs(s - 0.746031746031746) < 1e-12)
  }
}

/** Greedy min-id maximal matching on hand graphs. */
class MaximalMatchingSpec extends SparkSpec {
  import spark.implicits._

  private def matchPairs(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    graft.dedup.MaximalMatching.run(edges.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("path 1-2-3-4: ends pair up, matching is maximal") {
    // round 1: 1 proposes 2, 2 proposes 1 → (1,2); 3 proposes 2 (taken),
    // 4 proposes 3 → no mutual; round 2: survivors {3,4} pair up
    assert(matchPairs(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
      == Set((1L, 2L), (3L, 4L)))
  }

  test("triangle: one pair matches, the third node stays single") {
    assert(matchPairs(Seq((1L, 2L), (1L, 3L), (2L, 3L))) == Set((1L, 2L)))
  }

  test("star: the hub matches its smallest leaf only") {
    assert(matchPairs(Seq((1L, 2L), (1L, 3L), (1L, 4L))) == Set((1L, 2L)))
  }
}

/** M4 downsampling + linear interpolation on constructed series. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ordersDir(rows: Seq[(Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("rs").toString
    rows.toDF("o_orderkey", "d", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("m4 keeps min/max/first/last per bucket") {
    // 100 days, one order per day, value = day index; bucket width 2
    val base = java.time.LocalDate.parse("2024-01-01")
    val dir = ordersDir((0 until 100).map(i =>
      (i.toLong, base.plusDays(i).toString, i.toDouble)))
    val got = Registry.byName("w21_m4_downsample").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.size == 50)
    // monotone series: first=min, last=max in every bucket
    assert(got(0L) == (0.0, 1.0, 0.0, 1.0))
    assert(got(49L) == (98.0, 99.0, 98.0, 99.0))
  }

  test("interpolation recovers a linear series exactly") {
    // value = 2 orders on even stride days... build counts: day i has
    // (i+1) orders → daily count is linear in i, so interp == truth
    val base = java.time.LocalDate.parse("2024-01-01")
    val rows = (0 until 10).flatMap(i =>
      (0 to i).map(j => (i.toLong * 100 + j, base.plusDays(i).toString, 1.0)))
    val dir = ordersDir(rows)
    val got = Registry.byName("w22_linear_interpolate").run(spark, dir)
      .collect().map(r => (r.getDate(0).toString,
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // day 0: observed, count 1
    assert(got("2024-01-01") == ((true, 1L, 1L, 1.0)))
    // day 1: between obs t=0 (1) and t=3 (4): 1 + (4-1)*1/3 = 2 exactly
    assert(got("2024-01-02") == ((false, 6L, 3L, 2.0)))
    // day 9: after the last observation (t=9 % 3 == 0 → observed)
    assert(got("2024-01-10") == ((true, 10L, 1L, 10.0)))
  }
}
