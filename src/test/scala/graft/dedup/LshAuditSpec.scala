package graft.dedup

import graft.{Registry, SparkSpec}

/** Banding audit semantics on planted fixtures. */
class LshAuditSpec extends SparkSpec {
  import spark.implicits._

  private def audit(texts: Seq[String]) = {
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("lsh").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Registry.byName("d24_lsh_recall_audit").run(spark, dir).collect().head
  }

  test("identical docs: full recall, candidates include the pair") {
    val base = (1 to 40).map("tok" + _).mkString(" ")
    val r = audit(Seq(base, base, (1 to 40).map("zzz" + _).mkString(" ")))
    assert(r.getAs[Long]("n_exact") == 1L)
    assert(r.getAs[Long]("n_hits") == 1L)
    assert(r.getAs[Long]("recall_ppm") == 1000000L)
  }

  test("disjoint docs: no exact pairs, recall is NULL not a crash") {
    val r = audit(Seq(
      (1 to 30).map("aa" + _).mkString(" "),
      (1 to 30).map("bb" + _).mkString(" ")))
    assert(r.getAs[Long]("n_exact") == 0L)
    assert(r.isNullAt(r.fieldIndex("recall_ppm")))
  }

  test("near-dup above threshold is both exact and found by banding") {
    // 59 shared tokens + 1 changed → shingle jaccard well above 0.8 and
    // overwhelmingly likely to collide in at least one of 16 bands
    val a = (1 to 60).map("w" + _).mkString(" ")
    val b = ((1 to 59).map("w" + _) :+ "CHANGED").mkString(" ")
    val r = audit(Seq(a, b))
    assert(r.getAs[Long]("n_exact") == 1L)
    assert(r.getAs[Long]("n_hits") == 1L)
  }
}
