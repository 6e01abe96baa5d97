package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ composition invariants vs its two parents on real sf0.001
  * embeddings.
  */
class IvfPqSpec extends SparkSpec {

  test("pruned ADC ranking is sound vs global PQ and complete in shape") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val ivfpq = IvfPq.ivfPqTopK(e, q, 5).collect()
    assert(ivfpq.length == 50, s"${ivfpq.length} rows") // 10 queries × 5
    // per query: adc nondecreasing in rank
    ivfpq.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        s"query $qid not monotone: ${byRank.mkString(",")}")
    }
    // list pruning can only LOSE candidates: the pruned rank-r distance
    // is ≥ the global PQ rank-r distance, element-wise
    val pq = ProductQuantization.pqTopK(e, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getDouble(2)).toMap
    ivfpq.foreach { r =>
      val global = pq((r.getLong(0), r.getInt(3)))
      assert(r.getDouble(2) >= global - 1e-9,
        s"query ${r.getLong(0)} rank ${r.getInt(3)}: pruned " +
          s"${r.getDouble(2)} < global $global")
    }
  }
}
