package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Gaps-and-islands merge + sweep-line coverage on hand intervals. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def ordersDir(rows: Seq[(Long, Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("iv").toString
    rows.toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", to_date(col("d")))
      .drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("overlapping chain merges; a gap opens a new island") {
    val dir = ordersDir(Seq(
      (1L, 7L, "2024-01-01"),   // [01-01, 01-31]
      (2L, 7L, "2024-01-20"),   // overlaps → same island
      (3L, 7L, "2024-04-01"),   // gap → new island
      (4L, 8L, "2024-01-05")))  // other key: own island
    val got = Registry.byName("w18_interval_merge").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toString, r.getDate(3).toString, r.getLong(4)))
      .toSet
    assert(got == Set(
      (7L, 1L, "2024-01-01", "2024-02-19", 2L),
      (7L, 2L, "2024-04-01", "2024-05-01", 1L),
      (8L, 1L, "2024-01-05", "2024-02-04", 1L)))
  }

  test("an interval starting ON a previous end co-islands (touching)") {
    val dir = ordersDir(Seq(
      (1L, 1L, "2024-01-01"),   // ends 01-31
      (2L, 1L, "2024-01-31")))  // starts exactly at the running max
    val got = Registry.byName("w18_interval_merge").run(spark, dir)
    assert(got.count() == 1)
  }

  test("coverage counts concurrently-open intervals per boundary") {
    val dir = ordersDir(Seq(
      (1L, 1L, "2024-01-01"),   // open [01-01 .. 01-31]
      (2L, 2L, "2024-01-10")))  // open [01-10 .. 02-09]
    val got = Registry.byName("w19_interval_coverage").run(spark, dir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got("2024-01-01") == 1L)
    assert(got("2024-01-10") == 2L)
    assert(got("2024-02-01") == 1L)  // first closed the day after 01-31
    assert(got("2024-02-10") == 0L)
  }
}

/** HITS integer-unit recurrence on hand digraphs. */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long])
      : Map[Long, (Long, Long)] =
    graft.dedup.Hits.run(edges.toDF("src", "dst"), nodes.toDF("id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("path 1→2→3: tail is a pure authority, head a pure hub") {
    val got = run(Seq((1L, 2L), (2L, 3L)), Seq(1L, 2L, 3L))
    assert(got(1L)._2 == 0L)  // nothing points at the head
    assert(got(3L)._1 == 0L)  // the tail points at nothing
    assert(got(1L)._1 > 0L && got(3L)._2 > 0L)
    // max-normalisation: some node carries exactly 1e6 on each axis
    assert(got.values.map(_._1).max == 1000000L)
    assert(got.values.map(_._2).max == 1000000L)
  }

  test("star hub → leaves: the centre is THE hub, leaves tie as auths") {
    val got = run(Seq((0L, 1L), (0L, 2L), (0L, 3L)), Seq(0L, 1L, 2L, 3L))
    assert(got(0L)._1 == 1000000L && got(0L)._2 == 0L)
    assert(Set(1L, 2L, 3L).map(got(_)._2) == Set(1000000L))
    assert(Set(1L, 2L, 3L).map(got(_)._1) == Set(0L))
  }
}

/** Bounded Bellman–Ford on hand weighted graphs. */
class SsspSpec extends SparkSpec {
  import spark.implicits._

  test("min-cost route beats fewer-hops; unreached within k absent") {
    // 1 →(5) 2 →(1) 3 ; 1 →(1) 4 →(1) 3 : best dist(3) = 2 via 4
    // long tail 3→5→6→7→8→9→10 of weight 1 each: node 10 needs 7 hops
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 4L, 1L),
      (4L, 3L, 1L), (3L, 5L, 1L), (5L, 6L, 1L), (6L, 7L, 1L),
      (7L, 8L, 1L), (8L, 9L, 1L), (9L, 10L, 1L))
      .toDF("src", "dst", "w")
    val nodes = (1L to 10L).toDF("id")
    val got = graft.dedup.Sssp.run(edges, nodes,
        nodes.filter(col("id") === 1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 2L)
    assert(got(2L) == 5L)
    assert(got(8L) == 6L)       // 6 edges: reached on the last round
    assert(!got.contains(9L))   // 7 edges > Rounds: out of contract
    assert(!got.contains(10L))
  }
}

/** Grid-blocked radius join on hand coordinates. */
class GeoJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pairs within R survive, including across a cell boundary") {
    val c = Seq((1L, 2999L, 2999L), (2L, 50000L, 50000L))
      .toDF("c_custkey", "lat", "lon")
    val s = Seq(
      (10L, 3001L, 3001L),    // neighbour cell, distance ~2.8 < 3000
      (11L, 2999L, 2998L),    // same cell, adjacent
      (12L, 9000L, 2999L))    // 6001 away in lat: out of radius
      .toDF("s_suppkey", "lat", "lon")
    val got = GeoJoin.radiusJoin(c, s, 3000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L)))
  }
}

/** Skyline / MI / ACF on constructed tables. */
class InfoStatsSpec extends SparkSpec {
  import spark.implicits._

  test("skyline keeps exactly the undominated (price, size) points") {
    val dir = java.nio.file.Files.createTempDirectory("sky").toString
    Seq((1L, 10.0, 5), (2L, 10.0, 7), (3L, 12.0, 7), (4L, 12.0, 9),
      (5L, 20.0, 1))
      .toDF("p_partkey", "p_retailprice", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Registry.byName("a45_skyline").run(spark, dir)
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSet
    // (10,7) dominates (10,5) and (12,7); (12,9) survives; (20,1) is
    // dominated by every cheaper point with larger size
    assert(got == Set((10.0, 7), (12.0, 9)))
  }

  test("mutual information of independent columns is zero") {
    val dir = java.nio.file.Files.createTempDirectory("mi").toString
    // perfectly balanced 2×2 independent layout
    (1 to 100).map(i =>
        (i.toLong, if (i % 2 == 0) "H" else "L", if (i % 4 < 2) "F" else "O"))
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Registry.byName("a44_mutual_info").run(spark, dir).head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(2) == 0.0)
  }

  test("a perfectly 7-periodic daily series has acf(7) = 1") {
    val dir = java.nio.file.Files.createTempDirectory("acf").toString
    val base = java.time.LocalDate.parse("2024-01-01")
    // day i gets (i % 7) + 1 orders
    (0 until 70).flatMap { i =>
      (0 to i % 7).map(j => (i.toLong * 100 + j, base.plusDays(i).toString))
    }.toDF("o_orderkey", "d")
      .withColumn("o_orderdate", to_date(col("d"))).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Registry.byName("w20_acf_lags").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(7L) == 1.0)
    assert(got(1L) < 1.0)
  }
}
