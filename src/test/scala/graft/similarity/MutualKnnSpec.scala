package graft.similarity

import graft.SparkSpec

/** Mutuality semantics: the intersection keeps reciprocated edges and
  * drops asymmetric spokes the union graph would keep.
  */
class MutualKnnSpec extends SparkSpec {
  import spark.implicits._

  test("asymmetric neighbour edges are pruned, mutual ones survive") {
    // with k=1: A↔B are each other's nearest; C's nearest is B, but B's
    // nearest is A — so (B,C) is a spoke, not mutual
    val emb = Seq(
      (1L, Array(1.00f, 0.00f)), // A
      (2L, Array(0.99f, 0.10f)), // B — closest to A
      (3L, Array(0.80f, 0.60f)), // C — closest to B, but not reciprocated
    ).toDF("vec_id", "embedding")
    val got = MutualKnn.mutualEdges(emb, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("one top-k build: the only join in the plan is the scoring join") {
    // the r08 rewrite replaced the topk⋈topk self-join (which re-ran the
    // n² scoring pass + window once per branch) with a GROUP BY over
    // unordered pairs — a regression back to the join shape shows up as
    // extra Join nodes
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.99f, 0.1f)), (3L, Array(0.98f, 0.15f)))
      .toDF("vec_id", "embedding")
    val plan = MutualKnn.mutualEdges(emb, 2)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Join")) == 1, plan)
  }

  test("within a clique everything is mutual") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.99f, 0.1f)), (3L, Array(0.98f, 0.15f)))
      .toDF("vec_id", "embedding")
    val got = MutualKnn.mutualEdges(emb, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
