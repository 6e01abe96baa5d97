package graft.text

import graft.{Registry, SparkSpec}

/** KN cross-entropy is consistent with the registered KN model and its
  * coverage semantics.
  */
class KnScoringSpec extends SparkSpec {
  import spark.implicits._

  test("score recomputes from the t_kneserney_bigrams model; coverage and null guards hold") {
    // corpus where (x y) and (y x) clear the count>=5 model floor, plus
    // one doc full of unseen bigrams and one single-word doc
    val common = Seq.fill(8)("x y x y x y").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val docs = (common :+ (100L -> "q r s t") :+ (101L -> "solo"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("kn").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val model = Registry.byName("t_kneserney_bigrams").run(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(r.fieldIndex("p_kn"))).toMap
    val rows = Registry.byName("t_kn_crossentropy").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap

    // common docs: every bigram is in the model → full coverage, and the
    // entropy recomputes from the model probabilities
    val r0 = rows(0L)
    assert(r0.getAs[Long]("coverage_ppm") == 1000000L)
    val bgs = Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x"),
      ("x", "y"))
    val expected = -bgs.map(b => math.log(model(b)) / math.log(2.0)).sum /
      bgs.length
    assert(math.abs(r0.getAs[Double]("cross_entropy") - expected) < 1e-6)

    // unseen-bigram doc: zero coverage, NULL entropy (not a crash)
    val rq = rows(100L)
    assert(rq.getAs[Long]("coverage_ppm") == 0L)
    assert(rq.isNullAt(rq.fieldIndex("cross_entropy")))

    // single-word doc: no bigrams at all → NULL coverage and entropy
    val rs = rows(101L)
    assert(rs.getAs[Long]("n_bigrams") == 0L)
    assert(rs.isNullAt(rs.fieldIndex("coverage_ppm")))
  }
}
