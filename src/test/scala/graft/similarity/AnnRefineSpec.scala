package graft.similarity

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the PQ + exact-refine ANN row. */
class AnnRefineSpec extends SparkSpec {

  test("pq refine: exact distances, recall >= raw PQ vs brute L2 truth") {
    val dir = sf("sf0.001")
    val e = graft.Tables(spark, dir).embeddings
    val vecs = e.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val queries = vecs.keys.filter(_ < 10).toSeq
    val truth = queries.map { q =>
      q -> vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, l2(vecs(q), v)) }
        .sortBy(t => (t._2, t._1)).take(AnnRefine.K).map(_._1).toSet
    }.toMap
    val refined = Registry.byName("ann_pq_refine_topk")
      .run(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("l2_dist")))
    // exact distances: refined l2 must equal the direct recompute
    refined.foreach { case (q, n, d) =>
      assert(math.abs(d - l2(vecs(q), vecs(n))) < 1e-5, s"($q,$n)")
    }
    val refRecall = queries.map { q =>
      refined.filter(_._1 == q).map(_._2).count(truth(q)) }.sum.toDouble /
      (queries.size * AnnRefine.K)
    val raw = Registry.byName("ann_pq_topk").run(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val rawRecall = queries.map { q =>
      raw.filter(_._1 == q).map(_._2).count(truth(q)) }.sum.toDouble /
      (queries.size * AnnRefine.K)
    assert(refRecall >= rawRecall - 1e-9,
      s"refine recall $refRecall < raw PQ recall $rawRecall")
    assert(refRecall > 0.5, s"refine recall $refRecall too low")
  }
}
