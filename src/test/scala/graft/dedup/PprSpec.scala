package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Personalized PageRank must concentrate rank near the seed set and
  * decay with hop distance — pinned on a 5-node path with one seed end.
  */
class PprSpec extends SparkSpec {

  test("rank decays monotonically with distance from the seed") {
    import spark.implicits._
    // path 1—2—3—4—5, seed = node 1
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val edges = und.union(und.select(col("dst").as("src"),
      col("src").as("dst")))
    val nodes = Seq((1L, Ppr.SeedUnits), (2L, 0L), (3L, 0L), (4L, 0L),
      (5L, 0L)).toDF("id", "tp")
    val ranks = Ppr.run(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(1L) > ranks(2L))
    assert(ranks(2L) > ranks(3L))
    assert(ranks(3L) > ranks(4L))
    assert(ranks(4L) >= ranks(5L))
    // a node with no path to any seed holds zero rank
    val nodes2 = nodes.union(Seq((99L, 0L)).toDF("id", "tp"))
    val r2 = Ppr.run(edges, nodes2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(99L) === 0L)
  }

  test("registered query: seeds outrank the global median") {
    val dir = sf("sf0.001")
    val df = graft.Registry.byName("d22_personalized_pagerank")
      .run(spark, dir)
    val t = graft.Tables(spark, dir)
    val minNation = t.supplier.agg(org.apache.spark.sql.functions
      .min(col("s_nationkey"))).collect()(0).getAs[Number](0).longValue
    val seeds = t.supplier.filter(col("s_nationkey") === minNation)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val ranks = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seeds.nonEmpty && ranks.nonEmpty)
    val med = ranks.values.toSeq.sorted.apply(ranks.size / 2)
    val seedMean = seeds.toSeq.map(ranks).sum / seeds.size
    assert(seedMean > med,
      s"seed mean $seedMean should exceed global median $med")
  }
}
