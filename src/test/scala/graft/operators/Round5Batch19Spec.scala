package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Independent Scala recomputes for batch 19 (the oracles prove
  * engine parity; these prove the formulas).
  */
class Round5Batch19Spec extends SparkSpec {

  test("theil: matches a plain-Scala recompute and orders as expected") {
    val xs = graft.Tables(spark, sf("sf0.001")).orders
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("x"))
      .collect().map(_.getDouble(1))
    val n = xs.length
    val mu = xs.sum / n
    val t = xs.map(x => (x / mu) * math.log(x / mu)).sum / n
    val l = xs.map(x => math.log(mu / x)).sum / n
    val got = Registry.byName("a81_theil_index")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("theil_t") - t) < 1e-4)
    assert(math.abs(got.getAs[Double]("theil_l") - l) < 1e-4)
    assert(t >= 0 && l >= 0)
  }

  test("jsd: bounded by ln 2 and matches a direct recompute") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
    val re = "[a-z]+".r
    val c0 = collection.mutable.Map.empty[String, Long]
    val c1 = collection.mutable.Map.empty[String, Long]
    docs.foreach { r =>
      val m = if (r.getLong(0) % 2 == 0) c0 else c1
      re.findAllIn(r.getString(1)).foreach(t =>
        m.update(t, m.getOrElse(t, 0L) + 1))
    }
    val vocab = (c0.keySet ++ c1.keySet).toSeq
    val v = vocab.size
    val n0 = c0.values.sum; val n1 = c1.values.sum
    val jsd = vocab.map { t =>
      val p = (c0.getOrElse(t, 0L) + 1).toDouble / (n0 + v)
      val q = (c1.getOrElse(t, 0L) + 1).toDouble / (n1 + v)
      val m = (p + q) / 2
      (p * math.log(p / m) + q * math.log(q / m)) / 2
    }.sum
    val got = Registry.byName("t_jensen_shannon")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("vocab") == v)
    assert(math.abs(got.getAs[Double]("jsd_nats") - jsd) < 1e-4)
    assert(jsd >= 0 && jsd <= math.log(2.0) + 1e-12)
  }

  test("cronbach: matches covariance-matrix recompute") {
    val rows = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("n_chars"),
        size(split(col("text"), " ")).cast("long"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+"), lit(0))).cast("long"))
      .collect().map(r => Array(r.getLong(0).toDouble,
        r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = rows.length
    def vvar(xs: Seq[Double]) = {
      val m = xs.sum / n; xs.map(x => (x - m) * (x - m)).sum
    }
    val items = (0 until 3).map(i => vvar(rows.map(_(i)))).sum
    val total = vvar(rows.map(_.sum))
    val expected = 1.5 * (1 - items / total)
    val got = Registry.byName("a82_cronbach_alpha")
      .run(spark, sf("sf0.001")).collect().head
    assert(math.abs(got.getAs[Double]("alpha") - expected) < 1e-4)
  }

  test("conversion lag: P50/P90 match the sorted-lag pick") {
    import spark.implicits._
    val ev = graft.Tables(spark, sf("sf0.001")).events
      .select(col("user_id"), col("event_type"),
        to_date(col("ts")).as("day"))
      .as[(Long, String, java.sql.Date)].collect()
    val firstView = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3.toLocalDate).min }
    val lags = firstView.flatMap { case (u, v) =>
      val ps = ev.filter(e => e._1 == u && e._2 == "purchase")
        .map(_._3.toLocalDate).filter(p => !p.isBefore(v))
      if (ps.isEmpty) None
      else Some(java.time.temporal.ChronoUnit.DAYS
        .between(v, ps.min).toInt)
    }.toSeq.sorted
    val n = lags.length
    val p50 = lags((n + 1) / 2 - 1)
    val p90 = lags(((9 * n + 9) / 10).min(n) - 1)
    val got = Registry.byName("e_conversion_lag")
      .run(spark, sf("sf0.001")).collect().head
    assert(got.getAs[Long]("n_converted") == n)
    assert(got.getAs[Int]("p50_days") == p50)
    assert(got.getAs[Int]("p90_days") == p90)
  }
}
