package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import java.time.LocalDate

/** SURVEY §7.2 end-to-end slice: synthetic raw ads → salary
  * normalisation → vector dedup links → connected components → weekly
  * snapshot spine with per-window exemplar dedup → stock index →
  * indicator → published JSON/CSV/datadict. Hand-computed expectations
  * throughout.
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  // 8 ads over two weeks; c is an exact content-duplicate of b (same
  // vector); g of f. Each has a YEAR salary.
  private val dim = 6
  private def vec(seed: Int) =
    Array.tabulate(dim)(i => math.sin(seed * 31 + i).toFloat * 10f)

  private val ads = Seq(
    ("a", "2021-02-01", "London", vec(1), Some(20000.0)),
    ("b", "2021-02-02", "Leeds", vec(2), Some(30000.0)),
    ("c", "2021-02-03", "Leeds", vec(2), Some(30000.0)), // dup of b
    ("d", "2021-02-04", "York", vec(4), None),
    ("e", "2021-02-08", "London", vec(5), Some(40000.0)),
    ("f", "2021-02-09", "Hull", vec(6), Some(50000.0)),
    ("g", "2021-02-10", "Hull", vec(6), Some(50000.0)), // dup of f
    ("h", "2021-02-11", "York", vec(8), Some(60000.0)),
  ).map { case (id, day, loc, v, sal) =>
    (id, ts(day), loc, v, sal, sal, sal, Some("YEAR"), Some("GBP"),
      "a perfectly adequate description")
  }.toDF("id", "created", "job_location_raw", "vector", "raw_salary",
    "raw_min_salary", "raw_max_salary", "raw_salary_unit",
    "raw_salary_currency", "description")

  test("full weekly-stock pipeline with dedup produces expected counts") {
    // 1. enrichment: salary rule chain
    val enriched = Salaries.extractSalary(ads)
    assert(enriched.filter(col("min_annualised_salary").isNotNull).count() == 7)

    // 2. D2: vector near-dup links (identical vectors => weight 1)
    val links = VectorDedup.nearDuplicateLinks(
      ads.select("id", "created", "vector"), dim = dim, backgroundSample = 8)
    val linkPairs = links.select("first_id", "second_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(linkPairs.contains(("b", "c")))
    assert(linkPairs.contains(("f", "g")))

    // 3. weekly snapshot with per-window exemplar dedup (2-week spine)
    val weekly = Getters.weeklyAds(spark, enriched, links,
      LocalDate.parse("2021-02-08"), LocalDate.parse("2021-02-15"),
      splitByLocation = false)
    val counts = weekly.groupBy("week_date").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // week 2021-02-08 window [2020-12-28, 2021-02-08] (bounds inclusive,
    // like the reference's BETWEEN): a,b,c,d,e minus dup c → 4
    // week 2021-02-15 window [2021-01-04, 2021-02-15]: all 8 minus c,g → 6
    assert(counts == Map("2021-02-08" -> 4, "2021-02-15" -> 6))

    // 4. indicator: weekly stock against an index of 2 ads/week
    val stock = Indicators.weeklyStock(weekly, indexValue = 2.0)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    assert(stock == Map("2021-02-08" -> 200.0, "2021-02-15" -> 300.0))

    // 5. salary spread over the deduped snapshot
    val spread = Indicators.weeklySalarySpread(weekly)
    val w2 = spread.filter(col("date") === "2021-02-15").head()
    // week-2 survivors with salaries: a(20k) b(30k) e(40k) f(50k) h(60k)
    assert(w2.getDouble(w2.fieldIndex("median_min_salaries_k")) == 40.0)

    // 6. publish
    val out = java.nio.file.Files.createTempDirectory("pub").toString
    Publisher.saveData(stock.toSeq.toDF("date", "volume_idx"), out,
      "weekly_stock", "0.1.0", "Weekly stock of live ads")
    for (v <- Seq("latest", "0.1.0")) {
      assert(new java.io.File(s"$out/$v/weekly_stock.json").exists())
      assert(new java.io.File(s"$out/$v/weekly_stock.csv").exists())
      assert(new java.io.File(s"$out/$v/weekly_stock_data_dict.txt").exists())
    }
  }
}
