package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF ANN quality: recall of the bucketed search against the exact
  * brute-force baseline on the real embeddings table.
  */
class AnnSpec extends SparkSpec {

  test("ivf top-k recall vs brute force >= 0.5 with nprobe=4/16 lists") {
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val brute = SimilarityQueries.bruteForceTopK(e, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityQueries.ivfTopK(e, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("cosine column agrees with a JVM dot product") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 1.0f, 2.0f)))
      .toDF("a", "b")
    val got = df.select(SimilarityQueries.cosine(col("a"), col("b")))
      .head().getDouble(0)
    assert(math.abs(got - 8.0 / 9.0) < 1e-12)
  }
}
