package graft.text


/** Per-source percentile thresholding. */
class QualityPercentileSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("bottom decile is cut independently per source") {
    val got = graft.Registry.byName("t_quality_percentile")
      .run(spark, sf("sf0.001"))
    // per source: ~10% dropped, never all, never none (sources are
    // large enough that the decile is populated)
    val per = got.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("dropped"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(per.nonEmpty)
    per.foreach { case (src, n, dropped) =>
      val frac = dropped.toDouble / n
      assert(frac > 0.02 && frac < 0.2, s"$src: dropped $dropped of $n")
    }
    // pr is within [0, 1] and the keep rule is exactly pr >= 0.1
    assert(got.filter(col("pr") < 0 || col("pr") > 1).count() == 0)
    assert(got.filter(col("keep") =!= (col("pr") >= 0.1)).count() == 0)
  }
}

/** Kneser-Ney values against a hand computation. */
class KneserNeySpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("p_kn matches the closed form on constructed counts") {
    // bigrams: (a,b)×10, (c,b)×3, (a,d)×2  →  T=3 types
    // c1(a)=12, N1+(a·)=2; N1+(·b)=2
    // p_kn(b|a) = (max(4·10−3,0)·3 + 3·2·2) / (4·12·3) = 123/144
    val docs = (1 to 10).map(i => (i.toLong, "a b")) ++
      (11 to 13).map(i => (i.toLong, "c b")) ++
      (14 to 15).map(i => (i.toLong, "a d"))
    val tmp = java.nio.file.Files.createTempDirectory("kn").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.Registry.byName("t_kneserney_bigrams").run(spark, tmp)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // only (a,b) survives the c12 >= 5 support filter
    assert(got.keySet == Set(("a", "b")))
    val (c12, nl, nr, p) = got(("a", "b"))
    assert(c12 == 10L && nl == 2L && nr == 2L)
    assert(p == math.rint(123.0 / 144.0 * 1e6) / 1e6, s"p=$p")
  }
}

/** Systematic sampling: every stride boundary hit exactly once. */
class SystematicSampleSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("hit count equals total div stride; boundaries land where cumsum says") {
    // 100 docs of 100 chars: total 10_000 → exactly 1 stride boundary
    // (8192), crossed by doc 82 (cum 8200)
    val docs = (1L to 100L).map(i => (i, "x", 100L))
    val tmp = java.nio.file.Files.createTempDirectory("syst").toString
    docs.toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.Registry.byName("t_weighted_systematic_sample")
      .run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.map(_._2).sum == 10000L / 8192L)
    // shard order: cum runs shard 0 (ids 16,32,…), shard 1 (1,17,…), …
    // the boundary doc is deterministic; recompute it independently
    val order = (1L to 100L).sortBy(i => (i % 16, i))
    val cums = order.scanLeft(0L)((a, _) => a + 100L).tail
    val expectHit = order(cums.indexWhere(_ >= 8192L))
    assert(got.map(_._1).toSeq == Seq(expectHit), s"got=$got")
  }

  test("sf0.001: multiplicity accounts for every boundary, none double-counted") {
    val df = graft.Registry.byName("t_weighted_systematic_sample")
      .run(spark, sf("sf0.001"))
    val tot = graft.Tables(spark, sf("sf0.001")).documents
      .agg(sum(col("n_chars"))).collect().head.getLong(0)
    assert(df.agg(sum(col("n_hits"))).collect().head.getLong(0)
      == tot / 8192L)
  }
}
