package graft.similarity

import graft.SparkSpec

/** Truncation eval: when the prefix carries the signal, recall is 1. */
class DimTruncationSpec extends SparkSpec {
  import spark.implicits._

  test("prefix-informative embeddings keep full recall at 16 dims") {
    // 20-dim vectors; dims 1–16 hold the two orthogonal cluster
    // directions, dims 17–20 are constant noise → the 16-dim ranking
    // reproduces the full ranking exactly
    def v(cluster: Int) = Array.tabulate(20)(i =>
      if (i < 16) (if (i % 2 == cluster) 1f else 0f) else 0.1f)
    val rows = (0L to 4L).map(i => (i, v(0), 0)) ++
      (5L to 9L).map(i => (i, v(1), 1)) ++
      (10L to 19L).map(i => (i, v(0), 0)) ++
      (20L to 29L).map(i => (i, v(1), 1))
    val dir = java.nio.file.Files.createTempDirectory("trunc").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.Registry.byName("sim_dim_truncation_recall")
      .run(spark, dir).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getDouble(3) == 1.0,
        s"query ${r.getLong(0)}: recall ${r.getDouble(3)}")
    }
  }
}
