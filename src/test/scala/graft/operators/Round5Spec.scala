package graft.operators

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Zone-map safety and precision properties. */
class ZoneMapsSpec extends SparkSpec {

  test("pruning is safe and zones partition the table") {
    val rows = Registry.byName("s27_zonemap_prune")
      .run(spark, sf("sf0.001")).collect()
    // safety: a pruned zone can never contain a matching row
    assert(rows.forall(r =>
      !r.getAs[Boolean]("pruned") || r.getAs[Long]("n_matching") == 0L))
    // the stats must cover every row exactly once
    val total = Tables(spark, sf("sf0.001")).orders.count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    // min/max are a real envelope
    assert(rows.forall(r =>
      r.getAs[Double]("zmin") <= r.getAs[Double]("zmax")))
  }
}

/** Delta-join maintenance ≡ full recompute, bit-for-bit. */
class IncrementalJoinSpec extends SparkSpec {

  test("maintained join equals full join + aggregate") {
    val dir = sf("sf0.001")
    val got = Registry.byName("s28_incremental_join_maintenance")
      .run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val t = Tables(spark, dir)
    val want = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        graft.util.Stable.dsum(col("o_totalprice")).as("sum_total"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }
}

/** SCD2 temporal join: the as-of rewrite must equal the interval join. */
class TemporalJoinSpec extends SparkSpec {

  test("as-of rewrite equals the naive interval join on real data") {
    import org.apache.spark.sql.expressions.Window
    val dir = sf("sf0.001")
    val t = Tables(spark, dir)
    val got = Registry.byName("j22_scd2_temporal_join").run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // naive: build intervals with lead(), inequality-join, aggregate
    val lastPerDay = Window.partitionBy("o_custkey", "o_orderdate")
      .orderBy(col("o_orderkey").desc)
    val perKey = Window.partitionBy("v_custkey").orderBy("valid_from")
    val v = t.orders
      .withColumn("rn", row_number().over(lastPerDay))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("v_custkey"),
        col("o_orderdate").as("valid_from"),
        col("o_orderpriority").as("seg"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(perKey))
    val f = t.lineitem
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("f_custkey"),
        col("l_shipdate").as("f_ts"), col("l_extendedprice"))
    val want = f.join(v,
        col("f_custkey") === col("v_custkey") &&
          col("f_ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("f_ts") < col("valid_to")))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"),
        graft.util.Stable.dsum(col("l_extendedprice")).as("sum_price"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want)
  }
}

/** STL anomaly gate: scores derive from the decompose residuals with
  * exact per-series median/MAD.
  */
class StlAnomalySpec extends SparkSpec {

  test("score and flag are consistent with the decompose residuals") {
    val dir = sf("sf0.001")
    val resid = Registry.byName("e_stl_decompose").run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        r.getAs[Double]("residual")).toMap
    val rows = Registry.byName("e_stl_anomaly").run(spark, dir).collect()
    assert(rows.nonEmpty && rows.length == resid.size)
    rows.foreach { r =>
      val key = (r.getString(0), r.getDate(1).toString)
      assert(r.getAs[Double]("residual") == resid(key))
      val score = r.getAs[Double]("score")
      val expect = math.abs(r.getAs[Double]("residual") -
        r.getAs[Double]("med")) / (1.4826 * r.getAs[Double]("mad"))
      assert(score == expect)
      assert(r.getAs[Boolean]("is_anomaly") == (score > 3.0))
    }
    // per series, the median really is the residual median: half the
    // rows sit at or below it
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val med = rs.head.getAs[Double]("med")
      val below = rs.count(_.getAs[Double]("residual") <= med)
      assert(below * 2 >= rs.length)
    }
  }
}

/** Removal-effect attribution on a hand-built journey fixture. */
class RemovalAttributionSpec extends SparkSpec {
  import spark.implicits._

  test("touching-conversion counts, journey cut at first purchase") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1: view, click, purchase, signup(after → next journey, excluded)
    // u2: view, purchase
    // u3: click, signup (never converts → not counted anywhere)
    val events = Seq(
      (1L, ts(1), 1L, "view", 0d, ""), (2L, ts(2), 1L, "click", 0d, ""),
      (3L, ts(3), 1L, "purchase", 0d, ""), (4L, ts(4), 1L, "signup", 0d, ""),
      (5L, ts(1), 2L, "view", 0d, ""), (6L, ts(2), 2L, "purchase", 0d, ""),
      (7L, ts(1), 3L, "click", 0d, ""), (8L, ts(2), 3L, "signup", 0d, ""),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("rmattr").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Registry.byName("e_removal_attribution").run(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // 2 converting users; view touched by both, click by u1 only;
    // u1's post-purchase signup must NOT appear
    assert(got.keySet == Set("view", "click"))
    assert(got("view") == ((2L, 2L, 1.0, 2.0 / 3.0)))
    assert(got("click") == ((2L, 1L, 0.5, 1.0 / 3.0)))
  }
}
