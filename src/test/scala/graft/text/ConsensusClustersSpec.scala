package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Hand-computable ensemble: two runs over four nodes.
  *   run 1: {1,2} together, {3,4} together
  *   run 2: {1,2,3} together, {4} alone
  * Consensus weights: (1,2)=1.0; (1,3),(2,3),(3,4)... see asserts.
  */
class ConsensusClustersSpec extends SparkSpec {

  private lazy val ensemble = {
    import spark.implicits._
    Seq(
      (1, 1L, "a"), (1, 2L, "a"), (1, 3L, "b"), (1, 4L, "b"),
      (2, 1L, "x"), (2, 2L, "x"), (2, 3L, "x"), (2, 4L, "y"),
    ).toDF("run_id", "node", "label")
  }

  test("consensusMatrix: pairwise fraction of co-clustered runs") {
    val got = ConsensusClusters.consensusMatrix(ensemble)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got == Map(
      (1L, 2L) -> 1.0, // both runs
      (1L, 3L) -> 0.5, (2L, 3L) -> 0.5, // run 2 only
      (3L, 4L) -> 0.5, // run 1 only
    ))
  }

  test("consensusCommunities: threshold, components, singletons") {
    val got = ConsensusClusters
      .consensusCommunities(ensemble, minRuns = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only (1,2) survives minRuns=2; 3 and 4 become singletons
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
  }

  test("majority threshold merges the transitive consensus cluster") {
    val got = ConsensusClusters
      .consensusCommunities(ensemble, minRuns = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every pair that ever co-clustered links up: one big component
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  private lazy val labels =
    ConsensusClusters.consensusCommunities(ensemble, minRuns = 2L)

  test("nodeAffinity (absolute): mean co-occurrence with each community") {
    val got = ConsensusClusters.nodeAffinity(ensemble, labels,
        normalise = false)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // communities: A={1,2} (label 1), B={3}, C={4}; N=2 runs
    assert(got((1L, 1L)) == 1.0) // (n(1,1)+n(1,2))/(2*2)
    assert(got((1L, 3L)) == 0.5) // n(1,3)/2
    assert(got((1L, 4L)) == 0.0)
    assert(got((3L, 1L)) == 0.5)
    assert(got((3L, 3L)) == 1.0) // self co-occurs every run
    assert(got((3L, 4L)) == 0.5)
    assert(got((4L, 1L)) == 0.0)
    assert(got.size == 12) // dense 4 nodes x 3 communities
  }

  test("nodeAffinity normalised rows sum to 1") {
    val rows = ConsensusClusters.nodeAffinity(ensemble, labels)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val sums = rows.groupBy(_._1).map { case (_, v) => v.map(_._2).sum }
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-12))
    val one = rows.filter(_._1 == 1L).map(_._2).sorted
    assert(one.zip(Seq(0.0, 1.0 / 3, 2.0 / 3))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("clusterAffinity: symmetric mean inter-community co-occurrence") {
    val got = ConsensusClusters.clusterAffinity(ensemble, labels)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 1L)) == 1.0) // S_AA=8 / (2*2*2)
    assert(got((1L, 3L)) == 0.5 && got((3L, 1L)) == 0.5)
    assert(got((1L, 4L)) == 0.0 && got((4L, 1L)) == 0.0)
    assert(got((3L, 4L)) == 0.5 && got((4L, 3L)) == 0.5)
    assert(got((3L, 3L)) == 1.0 && got((4L, 4L)) == 1.0)
  }

  test("subCommunities: stricter threshold splits within parents only") {
    import spark.implicits._
    // r1 groups everyone; r2 splits {1,2}/{3,4}; r3 isolates 3 and 4
    val ens3 = Seq(
      (1, 1L, "a"), (1, 2L, "a"), (1, 3L, "a"), (1, 4L, "a"),
      (2, 1L, "p"), (2, 2L, "p"), (2, 3L, "q"), (2, 4L, "q"),
      (3, 1L, "u"), (3, 2L, "u"), (3, 3L, "v"), (3, 4L, "w"),
    ).toDF("run_id", "node", "label")
    val parents = ConsensusClusters.consensusCommunities(ens3, minRuns = 2L)
    val got = ConsensusClusters.subCommunities(ens3, parents, minRunsSub = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 1L), (2L, 1L, 1L), (3L, 3L, 3L), (4L, 3L, 4L)))
  }

  test("partitionNmi: identical partitions score 1, independent score 0") {
    import spark.implicits._
    val p = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("node", "label")
    val same = ConsensusClusters.partitionNmi(p, p).head()
    assert(same.getDouble(3) == 1.0)
    assert(math.abs(same.getDouble(0) - math.log(2)) < 1e-6) // MI = H = ln 2
    val indep = Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "y"))
      .toDF("node", "label")
    assert(ConsensusClusters.partitionNmi(p, indep).head().getDouble(3) == 0.0)
    // degenerate single-cluster partitions: zero entropy ⇒ 0, never NaN
    val one = Seq((1L, "z"), (2L, "z"), (3L, "z"), (4L, "z"))
      .toDF("node", "label")
    assert(ConsensusClusters.partitionNmi(one, one).head().getDouble(3) == 0.0)
  }

  test("matrix is blocked by (run, label): no cross-label pairs") {
    val pairs = ConsensusClusters.consensusMatrix(ensemble)
      .filter(col("src") === 1L && col("dst") === 4L)
    assert(pairs.count() == 0) // 1 and 4 never share a cluster
  }
}
