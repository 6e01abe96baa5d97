package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The synchronous Louvain sweep must ascend modularity on planted
  * structure: two cliques joined by one weak bridge — every node's best
  * move stays inside its own clique, and no node follows the bridge.
  */
class LouvainSpec extends SparkSpec {

  test("planted two-clique graph: moves stay within cliques") {
    import spark.implicits._
    // cliques {1,2,3} and {4,5,6} (w=3 edges), bridge 3—4 (w=1)
    val und = Seq(
      (1L, 2L, 3L), (1L, 3L, 3L), (2L, 3L, 3L),
      (4L, 5L, 3L), (4L, 6L, 3L), (5L, 6L, 3L),
      (3L, 4L, 1L)
    ).toDF("a", "b", "w")
    val got = Louvain.run(und).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cliqueA = Set(1L, 2L, 3L)
    val cliqueB = Set(4L, 5L, 6L)
    got.foreach { case (n, (community, gain)) =>
      assert(gain > 0, s"node $n found no positive move")
      if (cliqueA(n)) assert(cliqueA(community), s"$n left clique A")
      else assert(cliqueB(community), s"$n left clique B")
    }
  }

  test("isolated-pair graph: mutual adoption, exact gain") {
    import spark.implicits._
    val und = Seq((10L, 20L, 5L)).toDF("a", "b", "w")
    val got = Louvain.run(und).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // m2 = 2*5 = 10; gain = m2*w - k*k = 10*5 - 5*5 = 25 for both
    assert(got === Set((10L, 20L, 25L), (20L, 10L, 25L)))
  }

  test("registered query: communities cover all suppliers, gains >= 0") {
    val df = graft.Registry.byName("d21_louvain_move")
      .run(spark, sf("sf0.001"))
    val n = df.count()
    assert(n > 0)
    assert(df.filter(col("gain_num") < 0).count() === 0)
  }
}
