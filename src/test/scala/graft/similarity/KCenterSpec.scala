package graft.similarity

import org.apache.spark.sql.functions._

/** Greedy k-center: radii shrink, coverage beats a contiguous prefix. */
class KCenterSpec extends graft.SparkSpec {

  private lazy val e = graft.Tables(spark, sf("sf0.001")).embeddings

  private def coverageRadius(ids: Seq[Long]): Double = {
    val cents = e.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("cid"), col("embedding").as("centroid"))
    SimilarityQueries.withNearest(e, SimilarityQueries.pack(cents), 1)
      .select((lit(1.0) +
        element_at(col("lists"), 1).getField("negcos")).as("mind"))
      .agg(max(col("mind"))).collect().head.getDouble(0)
  }

  test("selection radii are non-increasing (greedy always picks the farthest)") {
    val rads = KCenter.fit(e).flatMap(_._3)
    assert(rads == rads.sorted.reverse, rads.mkString(", "))
    assert(rads.forall(r => r >= 0.0 && r <= 2.0 + 1e-9))
  }

  test("coreset covers tighter than the first-k-ids baseline") {
    val chosen = KCenter.fit(e).map(_._2)
    val baseline = e.orderBy("vec_id").limit(KCenter.K)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(coverageRadius(chosen) <= coverageRadius(baseline) + 1e-9,
      s"greedy=${coverageRadius(chosen)} baseline=${coverageRadius(baseline)}")
  }
}
