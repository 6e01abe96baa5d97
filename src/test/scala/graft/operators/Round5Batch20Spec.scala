package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Independent recomputes and invariants for batch 20. */
class Round5Batch20Spec extends SparkSpec {

  test("welch anova: matches scipy-style direct recompute") {
    val rows = graft.Tables(spark, sf("sf0.001")).orders
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val groups = rows.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val k = groups.size
    val stats = groups.map { xs =>
      val n = xs.length; val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val w = stats.map { case (n, _, v) => n / v }
    val bigW = w.sum
    val mw = stats.zip(w).map { case ((_, m, _), wi) => wi * m }.sum / bigW
    val a = stats.zip(w).map { case ((_, m, _), wi) =>
      wi * (m - mw) * (m - mw) }.sum
    val lam = stats.zip(w).map { case ((n, _, _), wi) =>
      math.pow(1 - wi / bigW, 2) / (n - 1) }.sum
    val f = (a / (k - 1)) / (1 + 2.0 * (k - 2) / (k * k - 1) * lam)
    val df2 = (k * k - 1) / (3 * lam)
    val got = Registry.byName("a83_welch_anova")
      .run(spark, sf("sf0.001")).collect().head
    assert(math.abs(got.getAs[Double]("f_stat") - f) < 1e-3,
      s"got=${got.getAs[Double]("f_stat")} expected=$f")
    assert(math.abs(got.getAs[Double]("df2") - df2) / df2 < 1e-4)
  }

  test("brown-forsythe: matches direct recompute on exact cents") {
    val rows = graft.Tables(spark, sf("sf0.001")).orders
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    val groups = rows.groupBy(_._1).values.map(_.map(_._2).sorted).toSeq
    val k = groups.size
    // doubled deviations from the doubled median, like the operator
    val devs = groups.map { xs =>
      val n = xs.length
      val lo = xs((n + 1) / 2 - 1); val up = xs(n / 2)
      xs.map(x => math.abs(2 * x - lo - up).toDouble)
    }
    val all = devs.flatten
    val nTot = all.length
    val grand = all.sum / nTot
    val ssb = devs.map { zs =>
      val m = zs.sum / zs.length
      zs.length * (m - grand) * (m - grand) }.sum
    val ssw = devs.map { zs =>
      val m = zs.sum / zs.length
      zs.map(z => (z - m) * (z - m)).sum }.sum
    val f = (ssb / (k - 1)) / (ssw / (nTot - k))
    val got = Registry.byName("a84_brown_forsythe")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n") == nTot)
    assert(math.abs(got.getAs[Double]("f_stat") - f) / f < 1e-6,
      s"got=${got.getAs[Double]("f_stat")} expected=$f")
  }

  test("span corruption: sentinels round-trip back to the original text") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Registry.byName("t_span_corruption")
      .run(spark, sf("sf0.001")).collect()
    assert(out.length == docs.size)
    val sentinel = "<extra_id_(\\d+)>".r
    out.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      val input = r.getAs[String]("masked_input")
      val target = r.getAs[String]("target")
      val n = r.getAs[Long]("n_spans")
      // sentinel count agrees in input, target and n_spans
      val inIds = sentinel.findAllMatchIn(input).map(_.group(1).toInt).toSeq
      val tgIds = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(inIds == (0 until n.toInt), s"doc $doc input ids $inIds")
      assert(tgIds == (0 until n.toInt), s"doc $doc target ids $tgIds")
      // splice targets back into the input → original token stream
      val spans = if (n == 0) Map.empty[Int, String]
      else {
        val parts = sentinel.split(target).toSeq // leading "" before id 0
        tgIds.zip(parts.drop(1).map(_.trim)).toMap
      }
      val rebuilt = sentinel.replaceAllIn(input,
        m => java.util.regex.Matcher.quoteReplacement(
          spans(m.group(1).toInt)))
      val orig = docs(doc).split(" ").filter(_.nonEmpty).mkString(" ")
      val norm = rebuilt.split(" ").filter(_.nonEmpty).mkString(" ")
      assert(norm == orig, s"doc $doc failed round-trip")
    }
  }

  test("co-purchase: weights recount against a brute pair scan") {
    val items = graft.Tables(spark, sf("sf0.001")).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val counts = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (pr, l) => pr -> l.size.toLong }
    val got = Registry.byName("j28_copurchase_projection")
      .run(spark, sf("sf0.001")).collect()
    assert(got.length <= 20 && got.nonEmpty)
    got.foreach { r =>
      val key = (r.getAs[Long]("src"), r.getAs[Long]("dst"))
      assert(counts(key) == r.getAs[Long]("w"), s"pair $key")
    }
    // the reported minimum weight must dominate all unreported pairs
    // up to the deterministic tie-break
    val minW = got.map(_.getAs[Long]("w")).min
    assert(counts.values.count(_ > minW) <= 20)
  }
}
