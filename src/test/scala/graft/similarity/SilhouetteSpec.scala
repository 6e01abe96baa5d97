package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Simplified-silhouette invariants on constructed clusters. */
class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  private def dir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val d = java.nio.file.Files.createTempDirectory("sil").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("tight separated clusters score near 1; a misassigned point < 0") {
    // cluster 0 at x-axis, cluster 1 at y-axis; vec 99 carries label 0
    // but sits exactly on cluster 1's support → its own-centroid
    // distance dwarfs its nearest-other distance → negative silhouette
    val a = Array(10f, 0f)
    val b = Array(0f, 10f)
    val rows = (1L to 5L).map(i => (i, a, 0)) ++
      (6L to 10L).map(i => (i, b, 1)) ++ Seq((99L, b, 0))
    val got = Silhouette.scores(spark.read
      .parquet(s"${dir(rows)}/embeddings.parquet"), dim = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    (6L to 10L).foreach(i => assert(got(i) > 0.9, s"vec $i: ${got(i)}"))
    assert(got(99L) < 0, s"misassigned point: ${got(99L)}")
    // the misassigned point also drags cluster 0's centroid: true
    // members still positive but below the clean cluster's score
    (1L to 5L).foreach(i => assert(got(i) > 0, s"vec $i: ${got(i)}"))
  }
}
