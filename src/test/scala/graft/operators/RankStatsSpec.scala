package graft.operators

import graft.{Registry, SparkSpec}

class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("spearman: monotone but nonlinear relation scores rho = 1") {
    val dir = java.nio.file.Files.createTempDirectory("sp").toString
    // y = x³ (monotone, very non-linear); one group
    (1 to 30).map(i => ("A", i.toDouble, (i.toDouble * i * i)))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Registry.byName("a50_spearman").run(spark, dir)
      .head()
    assert(got.getString(0) == "A")
    assert(got.getDouble(2) == 1.0)
  }

  test("spearman: ties share their average rank") {
    val dir = java.nio.file.Files.createTempDirectory("sp2").toString
    // x all equal → zero rank variance → rho undefined → NULL
    Seq(("A", 5.0, 1.0), ("A", 5.0, 2.0), ("A", 5.0, 3.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Registry.byName("a50_spearman").run(spark, dir).head()
    assert(got.isNullAt(2))
  }

  test("cuped: a covariate equal to the metric removes arm noise") {
    val dir = java.nio.file.Files.createTempDirectory("cu").toString
    // y correlates perfectly with its own hundred-bucket; arms differ
    // only via which rows they drew — CUPED pulls both means toward
    // the pooled value
    (1 to 200).map(i => (i.toLong, "X", i * 100.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Registry.byName("a51_cuped").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val rawGap = math.abs(got(0L)._1 - got(1L)._1)
    val adjGap = math.abs(got(0L)._2 - got(1L)._2)
    assert(adjGap < rawGap)   // variance reduction
    assert(adjGap < 1e-6)     // perfect covariate → gap vanishes
  }
}

class Rank1AlsSpec extends SparkSpec {
  import spark.implicits._

  test("factors rank items by popularity-weighted ratings") {
    // user 1 rates item 10 high, item 11 low; user 2 likewise —
    // item 10's factor must end above item 11's; tops normalise to 1000
    val ratings = Seq((1L, 10L, 9L), (1L, 11L, 1L),
      (2L, 10L, 8L), (2L, 11L, 2L)).toDF("u", "i", "r")
    val got = graft.similarity.Rank1Als.run(ratings)
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2))
      .toMap
    assert(got(("i", 10L)) == 1000L)
    assert(got(("i", 11L)) < 400L)
    assert(got.values.forall(v => v >= 1L && v <= 1000L))
  }
}
