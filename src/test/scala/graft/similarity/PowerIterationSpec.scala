package graft.similarity

import graft.SparkSpec

/** Power iteration on a cloud with one dominant axis must recover that
  * axis: the planted direction gets max-norm loading ±1, everything
  * orthogonal stays near 0, and the eigenvalue estimate approaches the
  * planted energy.
  */
class PowerIterationSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a planted dominant direction") {
    val dir = java.nio.file.Files.createTempDirectory("pca").toString
    // 200 vectors: strong ±e_3 component, weak deterministic noise on
    // the other axes (scaled ramps, no RNG)
    val dim = 64
    (0 until 200).map { v =>
      val arr = Array.tabulate(dim) { i =>
        val noise = 0.01f * (((v * 31 + i * 17) % 7) - 3)
        if (i == 3) (if (v % 2 == 0) 1.0f else -1.0f) + noise else noise
      }
      (v.toLong, arr.toSeq, v % 5)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = PowerIteration
      .topComponent(graft.Tables(spark, dir).embeddings)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == dim)
    val byI = rows.map(t => t._1 -> t._2).toMap
    assert(math.abs(byI(3)) == 1.0, "planted axis carries the max loading")
    rows.filter(_._1 != 3).foreach { case (i, l, _) =>
      assert(math.abs(l) < 0.15, s"axis $i loading $l should be small")
    }
    // eigenvalue ≈ Σ (±1)² = 200 within the noise budget
    val ev = rows.head._3
    assert(ev > 150 && ev < 250, s"eigenvalue $ev")
  }

  test("registered query is deterministic across runs") {
    val q = graft.Registry.byName("sim_pca_power")
    val a = q.run(spark, sf("sf0.001")).collect().map(_.toString).sorted
    val b = q.run(spark, sf("sf0.001")).collect().map(_.toString).sorted
    assert(a.length == 64 && a.toSeq == b.toSeq)
  }
}
