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
