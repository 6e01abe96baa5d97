package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TF-IDF semantics on a hand corpus: ubiquitous terms score zero,
  * rare repeated terms dominate.
  */
class TfIdfTermsSpec extends SparkSpec {
  import spark.implicits._

  test("rare repeated term outranks ubiquitous filler") {
    val dir = java.nio.file.Files.createTempDirectory("tfidf").toString
    Seq(
      (1L, "the the quantum quantum quantum the"),
      (2L, "the the the plain words here"),
      (3L, "the filler filler text text text"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = graft.Registry.all.find(_.name == "t_tfidf_terms").get
    val rows = q.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(4), r.getInt(5)))
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._4)
    // 'quantum' (df=1, tf=3) leads doc 1; 'the' (df=3) has idf ln(1)=0
    assert(doc1.head._2 == "quantum")
    assert(rows.filter(_._2 == "the").forall(_._3 == 0.0))
    // ranks are 1..k contiguous per doc
    assert(doc1.map(_._4).toSeq == (1 to doc1.length))
  }
}
