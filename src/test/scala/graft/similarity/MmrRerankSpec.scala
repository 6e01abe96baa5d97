package graft.similarity

import graft.SparkSpec

/** MMR semantics on hand vectors where the greedy trade-off is known:
  * a near-duplicate of the first pick must be displaced by a
  * relevant-but-different candidate, while pure relevance would keep it.
  */
class MmrRerankSpec extends SparkSpec {
  import spark.implicits._

  // query q = [1, 0]; A ≈ the query direction, B a near-duplicate of A
  // with slightly lower relevance, C relevant but near-orthogonal to A
  private val emb = Seq(
    (0L, Array(1f, 0f)),       // query
    (1L, Array(100f, 1f)),     // A: rel ≈ 1.0000
    (2L, Array(9f, 1f)),       // B: rel ≈ 0.9939, sim(A,B) ≈ 0.9949
    (3L, Array(6f, -6f)),      // C: rel ≈ 0.7071, sim(A,C) ≈ 0.7000
  ).toDF("vec_id", "embedding")

  private def order(): Seq[Long] =
    MmrRerank.rerank(emb, 0L).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1)).toSeq

  test("near-duplicate is displaced by the diverse candidate") {
    // relevance order is A, B, C; MMR picks A, then C (B's redundancy
    // penalty 9949 outweighs C's relevance gap), then B last
    assert(order() == Seq(1L, 3L, 2L))
  }

  test("selection is a permutation with steps 1..k and clamped maxsim") {
    val rows = MmrRerank.rerank(emb, 0L).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to rows.length))
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    // first pick has no prior selection; later picks do
    val byStep = rows.sortBy(_.getInt(0))
    assert(byStep.head.isNullAt(3))
    assert(byStep.tail.forall(!_.isNullAt(3)))
  }
}
