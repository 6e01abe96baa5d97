package graft.similarity

import graft.SparkSpec

/** NDCG@10 pinned on constructed embeddings where the ideal ranking is
  * achievable by construction.
  */
class NdcgSpec extends SparkSpec {
  import spark.implicits._

  private def embDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("ndcg").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("perfectly clustered labels score exactly 1e6 ppm") {
    // queries 0..9 split across two orthogonal label clusters; every
    // same-label vector is identical → all top-10 slots relevant and
    // n_rel ≥ 10 → DCG = IDCG exactly
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    val rows =
      (0L to 4L).map(i => (i, a, 0)) ++ (5L to 9L).map(i => (i, b, 1)) ++
        (10L to 19L).map(i => (i, a, 0)) ++ (20L to 29L).map(i => (i, b, 1))
    val got = graft.Registry.byName("sim_ndcg_at_k")
      .run(spark, embDir(rows)).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getLong(1) == 10L, s"n_rel_at_k ${r.getLong(1)}")
      assert(r.getLong(4) == 1000000L,
        s"query ${r.getLong(0)}: ndcg ${r.getLong(4)}")
    }
  }

  test("anti-clustered retrieval scores 0") {
    // each query's label has NO other members beyond what cosine ranks
    // last: query label is unique → n_rel = 0 → ndcg defined as 0
    val rows = (0L to 9L).map { i =>
      (i, Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat,
        0f, 0f), i.toInt)
    } ++ (10L to 29L).map { i =>
      (i, Array(0f, 0f, 1f, 0f), 999)
    }
    val got = graft.Registry.byName("sim_ndcg_at_k")
      .run(spark, embDir(rows)).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(4) == 0L,
        s"query ${r.getLong(0)}: n_rel ${r.getLong(2)} ndcg ${r.getLong(4)}")
    }
  }
}
