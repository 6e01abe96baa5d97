package graft.similarity

import graft.SparkSpec

/** Two tight pairs in 2-d: k=1 must link each node to its twin, and the
  * symmetrize step must not duplicate the mutual edges.
  */
class KnnGraphSpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.95f, 0.05f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.05f, 0.95f)),
    ).toDF("vec_id", "embedding")
  }

  test("k=1 links each node to its nearest neighbour, symmetrized once") {
    val got = KnnGraph.knnGraph(vecs, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 4L)))
  }

  test("asymmetric top-k membership still yields the undirected edge") {
    import spark.implicits._
    // chain 1 -- 2 -- 6: node 6's top-1 is 2, but 2's own top-1 is 1;
    // edge (2,6) must still appear because 6 ranked 2 (M = max(M, M.T))
    val plus = vecs.union(
      Seq((6L, Array(0.8f, 0.2f))).toDF("vec_id", "embedding"))
    val got = KnnGraph.knnGraph(plus, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 6L), (3L, 4L)))
  }

  test("blocked variant equals per-block brute-force") {
    import spark.implicits._
    val labelled = Seq(
      (1L, Array(1.0f, 0.0f), "A"),
      (2L, Array(0.95f, 0.05f), "A"),
      (6L, Array(0.8f, 0.2f), "A"),
      (3L, Array(0.0f, 1.0f), "B"),
      (4L, Array(0.05f, 0.95f), "B"),
    ).toDF("vec_id", "embedding", "label")
    val got = KnnGraph.knnGraphBlocked(labelled, k = 1, blockCol = "label")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // block A: 1<->2 mutual, 6 ranks 2; block B: 3<->4 — no cross-block edge
    assert(got == Set((1L, 2L), (2L, 6L), (3L, 4L)))
  }

  test("IVF-blocked graph recalls most brute edges on the sf corpus") {
    val e = graft.Tables(spark, sf("sf0.001")).embeddings
    val brute = KnnGraph.knnGraph(e, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nassign: Int): Double = {
      val ivf = KnnGraph.ivfKnnGraph(e, k = 5, nlist = 8, nassign = nassign)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & ivf).size.toDouble / brute.size
    }
    val r2 = recallAt(2)
    assert(r2 >= 0.5, s"recall@nassign=2 $r2")
    // multi-probe is the recall lever: 2 cells must dominate 1
    assert(r2 >= recallAt(1), "multi-probe recall must not regress")
  }

  test("no self-edges and src < dst canonical order") {
    val rows = KnnGraph.knnGraph(vecs, k = 2).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }
}
