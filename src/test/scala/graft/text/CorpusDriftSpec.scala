package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the integer-exact total-variation drift audit. */
class CorpusDriftSpec extends SparkSpec {

  private def run(dir: String) =
    graft.Registry.byName("t_corpus_drift").run(spark, dir)

  test("tv is a probability distance: within [0, 1] for every source") {
    val rows = run(sf("sf0.001"))
      .select(col("source"), col("tv_num").cast("double") / col("tv_den"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tv = r.getDouble(1)
      assert(tv >= 0.0 && tv <= 1.0, s"${r.getString(0)}: $tv")
    }
  }

  test("a single-source corpus has zero drift (p = q exactly)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "web", 16L),
      (2L, "alpha beta", "en", "web", 10L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("drift_one").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = run(dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("tv_num") == 0L)
  }

  test("disjoint-vocab sources sit at the simplex corners: tv = 1 - n_s/n") {
    import spark.implicits._
    // two sources sharing no words: present mass |c_ws·N - c_w·N_s| = 0
    // (c_w = c_ws within a source), absent mass = (N - N_s)·N_s
    // ⇒ tv = (N - N_s)/(2N) + ... actually tv = (N - N_s)/N... verify
    // numerically against independent arithmetic
    val docs = Seq(
      (1L, "aa bb cc", "en", "s1", 8L),
      (2L, "dd ee ff gg", "en", "s2", 11L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("drift_disj").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = run(dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tv_num"), r.getAs[Long]("tv_den"))).toMap
    // N = 7. s1: N_s = 3, present |3·c - c·3|·... c_ws·N − c_w·N_s with
    // c_w = c_ws: c·7 − c·3 = 4c summed over 3 tokens = 12;
    // absent: (7 − 3)·3 = 12 ⇒ tv_num = 24, tv_den = 42, tv = 4/7
    assert(out("s1") == (24L, 42L))
    // s2: N_s = 4: present Σ 3c = 12, absent (7−4)·4 = 12 ⇒ 24/56 = 3/7
    assert(out("s2") == (24L, 56L))
  }
}
