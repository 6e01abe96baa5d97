package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PQ ANN quality: asymmetric-distance search must track exact L2
  * ranking, and the whole train→encode→score chain must be
  * partition-order-independent.
  */
class PqSpec extends SparkSpec {

  private lazy val e =
    spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")

  test("pq top-k recall vs exact L2 top-k") {
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def l2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (0L until 10L).map { qid =>
      qid -> vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (l2(vecs(qid), v), id) }
        .sorted.take(5).map(_._2).toSet
    }.toMap
    val pq = ProductQuantization
      .pqTopK(e, e.filter(col("vec_id") < 10), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = (0L until 10L)
      .map(q => (exact(q) & pq(q)).size).sum / 50.0
    assert(recall >= 0.5, s"pq recall=$recall")
  }

  test("codes and ranking are partition-independent") {
    val a = ProductQuantization
      .pqTopK(e, e.filter(col("vec_id") < 10), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val b = ProductQuantization
      .pqTopK(e.repartition(13), e.filter(col("vec_id") < 10), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(a.toSeq == b.toSeq)
  }
}
