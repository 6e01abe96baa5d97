package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("misra-gries sketch retains every frequent key across partitionings") {
    // 3 heavy keys (freq 300/200/100) among 50 light keys (freq <= 10)
    val data = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
      Seq.fill(100)("gamma") ++
      (1 to 50).flatMap(i => Seq.fill(i % 10 + 1)(s"light$i"))
    val mg = udaf(new MisraGries(16))
    for (parts <- Seq(1, 4, 13)) {
      val sketch = data.toDF("w").repartition(parts)
        .agg(mg(col("w"))).head().getMap[String, Long](0)
      assert(sketch.keySet.intersect(Set("alpha", "beta", "gamma")) ==
        Set("alpha", "beta", "gamma"), s"parts=$parts sketch=$sketch")
      assert(sketch.size <= 16)
      // MG undercounts but never overcounts
      assert(sketch("alpha") <= 300 && sketch("beta") <= 200)
    }
  }

  test("percentile_approx tracks exact percentile (the Indicators flag)") {
    val df = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
    val row = df.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a"),
      percentile(col("l_extendedprice"), lit(0.5)).as("e")).head()
    val (a, e) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(a - e) / e < 0.01, s"approx=$a exact=$e")
  }

  test("approx_count_distinct stays within its error bound") {
    val df = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
    val row = df.agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("a"),
      countDistinct(col("l_orderkey")).as("e")).head()
    val (a, e) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
  }

  test("sketch + exact recount equals the true top-k") {
    val data = (1 to 1000).map(i => s"k${i % 37}")
    val df = data.toDF("w")
    val mg = udaf(new MisraGries(64))
    val cands = df.agg(mg(col("w"))).head().getMap[String, Long](0).keySet
    val viaSketch = df.filter(col("w").isInCollection(cands.toSeq))
      .groupBy("w").count().orderBy(desc("count"), asc("w")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = df.groupBy("w").count()
      .orderBy(desc("count"), asc("w")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSketch == exact)
  }
}
