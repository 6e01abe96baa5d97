package graft.similarity

import graft.SparkSpec

/** Label-centroid affinity on constructed clusters with exact cosines. */
class LabelAffinitySpec extends SparkSpec {
  import spark.implicits._

  test("identical clusters read 1, orthogonal clusters read 0") {
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    val rows =
      (1L to 5L).map(i => (i, a, 0)) ++
        (6L to 10L).map(i => (i, b, 1)) ++
        (11L to 15L).map(i => (i, a, 2))
    val dir = java.nio.file.Files.createTempDirectory("aff").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.Registry.byName("sim_label_affinity").run(spark, dir)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(4))).toMap
    assert(got.size == 3)
    assert(got((0, 2)) == 1.0, s"identical centroids: ${got((0, 2))}")
    assert(got((0, 1)) == 0.0 && got((1, 2)) == 0.0, s"orthogonal: $got")
  }

  test("mixed cluster lands between: cos is the centroid angle") {
    // label 0 = x-axis; label 1 = half x-axis, half y-axis → centroid
    // (0.5, 0.5) → cos = 0.5/(1·√0.5) = √0.5 ≈ 0.7071
    val rows =
      (1L to 4L).map(i => (i, Array(1f, 0f), 0)) ++
        Seq((5L, Array(1f, 0f), 1), (6L, Array(0f, 1f), 1))
    val dir = java.nio.file.Files.createTempDirectory("aff2").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.Registry.byName("sim_label_affinity").run(spark, dir)
      .collect().map(r => r.getDouble(4))
    assert(got.length == 1)
    assert(got.head == 0.7071, s"got ${got.head}")
  }
}
