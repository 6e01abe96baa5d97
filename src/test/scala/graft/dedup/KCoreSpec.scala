package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-core peeling on hand graphs (cascade, empty core, clique) plus the
  * pinned guarantee the oracle depends on: the registered edge set
  * converges within [[KCore.UnrollRounds]] at the gate scale.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int): (Map[Long, Long], Int) = {
    val (df, rounds) = KCore.run(edges.toDF("a", "b"), k)
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("triangle survives k=2, pendant chain unravels over rounds") {
    // triangle 1-2-3 with a pendant path 3-4-5: 5 peels, exposing 4,
    // which peels next round — a real cascade, not a single sweep
    val (got, rounds) = core(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)), k = 2)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(rounds == 3, s"5 then 4 then fixpoint, got $rounds")
  }

  test("path graph has an empty 2-core") {
    val (got, _) = core((1L to 6L).sliding(2).map(s => (s.head, s(1))).toSeq, 2)
    assert(got.isEmpty)
  }

  test("clique: every node survives with degree n-1") {
    val edges = for {
      a <- 1L to 5L; b <- 1L to 5L if a < b
    } yield (a, b)
    val (got, rounds) = core(edges, k = 4)
    assert(got == (1L to 5L).map(_ -> 4L).toMap)
    assert(rounds == 1)
  }

  test("registered co-occurrence graph converges within the oracle unroll") {
    val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
      .select("l_orderkey", "l_suppkey")
    val edges = li.alias("x").join(li.alias("y"),
      col("x.l_orderkey") === col("y.l_orderkey") &&
        col("x.l_suppkey") < col("y.l_suppkey"))
      .groupBy(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= KCore.MinCooc)
      .select("a", "b")
    val (df, rounds) = KCore.run(edges, KCore.K)
    val rows = df.collect()
    assert(rounds <= KCore.UnrollRounds,
      s"oracle unrolls ${KCore.UnrollRounds} rounds but engine needed $rounds")
    assert(rows.nonEmpty, "the gate-scale core must be non-trivial")
    assert(rows.forall(_.getLong(1) >= KCore.K))
  }
}
