package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and recomputes for batch 23. */
class Round5Batch23Spec extends SparkSpec {

  test("url canonicalize: idempotent, tracking-free, case-folded") {
    import spark.implicits._
    val rows = Registry.byName("t_url_canonicalize")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[String]("canonical")
      assert(c.startsWith("https://www."), c)
      assert(!c.contains("utm_") && !c.contains("ref="), c)
      assert(!c.contains("#"), c)
      val host = c.drop("https://".length).takeWhile(_ != '/')
      assert(host == host.toLowerCase, c)
    }
    // idempotence: canonicalize(canonical) == canonical
    val again = rows.map(_.getAs[String]("canonical")).toSeq
      .toDF("url")
      .select(graft.text.UrlCanonicalize.canonicalize(col("url"))
        .as("c2"), col("url"))
      .collect()
    again.foreach(r =>
      assert(r.getString(0) == r.getString(1), r.getString(1)))
    // both messy param orders collapse: doc 2k and 2k+1 differ only in
    // path, so canonical queries must be identical across parities
    val qs = rows.map { r =>
      val c = r.getAs[String]("canonical")
      (r.getAs[Long]("doc_id") % 2, c.dropWhile(_ != '?'))
    }.distinct
    assert(qs.map(_._2).distinct.length == 1,
      s"param orders did not collapse: $qs")
  }

  test("ratio metric CI: matches direct delta-method recompute") {
    val per = graft.Tables(spark, sf("sf0.001")).events
      .groupBy("user_id")
      .agg(sum(col("value")).as("x"), count(lit(1)).as("y"))
      .collect().map(r => (r.getDouble(1), r.getLong(2).toDouble))
    val n = per.length
    val sx = per.map(_._1).sum; val sy = per.map(_._2).sum
    val r0 = sx / sy
    val vx = per.map(p => math.pow(p._1 - sx / n, 2)).sum / (n - 1)
    val vy = per.map(p => math.pow(p._2 - sy / n, 2)).sum / (n - 1)
    val cxy = per.map(p => (p._1 - sx / n) * (p._2 - sy / n)).sum / (n - 1)
    val se = math.sqrt((vx + r0 * r0 * vy - 2 * r0 * cxy) /
      (n * math.pow(sy / n, 2)))
    val got = Registry.byName("a87_ratio_metric_ci")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("ratio") - r0) < 1e-6)
    assert(math.abs(got.getAs[Double]("se") - se) / se < 1e-6,
      s"got=${got.getAs[Double]("se")} expected=$se")
    assert(got.getAs[Double]("ci_lo") < r0 && r0 < got.getAs[Double]("ci_hi"))
  }
}
