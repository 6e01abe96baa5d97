package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** End-to-end indicator tests on a tiny synthetic corpus with
  * hand-computed outputs (SURVEY §5 plan).
  */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("standardiseLocation consolidates London and defaults unmatched") {
    val df = Seq(
      ("a", Some("UKI3"), Some("Camden")),
      ("b", Some("UKC1"), Some("Tees Valley")),
      ("c", None, None),
    ).toDF("id", "nuts_2_code", "nuts_2_name")
    val got = Indicators.standardiseLocation(df).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got("a") == (("UKI", "London")))
    assert(got("b") == (("UKC1", "Tees Valley")))
    assert(got("c") == (("ZZZ1", "Unmatched")))
  }

  test("weeklyStock = 100 * weekly count / index") {
    val weekly = Seq(
      ("2021-02-01", "x1"), ("2021-02-01", "x2"), ("2021-02-01", "x3"),
      ("2021-02-08", "y1"),
    ).map { case (w, id) => (java.sql.Date.valueOf(w), id) }
      .toDF("week_date", "id")
    val got = Indicators.weeklyStock(weekly, indexValue = 2.0).collect()
      .map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    assert(got == Map("2021-02-01" -> 150.0, "2021-02-08" -> 50.0))
  }

  test("salary quantiles: exact percentiles in £000, empty group → 0") {
    val weekly = Seq(
      ("2021-02-01", Some(10000.0), Some(20000.0)),
      ("2021-02-01", Some(20000.0), Some(40000.0)),
      ("2021-02-01", Some(30000.0), Some(60000.0)),
      ("2021-02-08", None, None), // all-null week → zeros
    ).map { case (w, mn, mx) => (java.sql.Date.valueOf(w), mn, mx) }
      .toDF("week_date", "min_annualised_salary", "max_annualised_salary")
    val got = Indicators.weeklySalarySpread(weekly).collect()
      .map(r => r.getDate(0).toString -> r.toSeq.tail.map(_.asInstanceOf[Double]))
      .toMap
    assert(got("2021-02-01") == Seq(15.0, 20.0, 25.0, 30.0, 40.0, 50.0))
    assert(got("2021-02-08") == Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("aggregateSkills percentages sum to 100 within each code") {
    val ads = Seq(
      ("UKC1", "Tees", "data"), ("UKC1", "Tees", "data"),
      ("UKC1", "Tees", "care"),
      ("UKD1", "Cumbria", "care"),
    ).toDF("nuts_2_code", "nuts_2_name", "cluster_0")
    val got = Indicators.aggregateSkills(ads, "nuts_2_code", "nuts_2_name")
    val rows = got.collect()
      .map(r => (r.getString(0), r.getString(2)) -> r.getDouble(3)).toMap
    assert(math.abs(rows(("UKC1", "data")) - 200.0 / 3) < 1e-9)
    assert(math.abs(rows(("UKC1", "care")) - 100.0 / 3) < 1e-9)
    assert(rows(("UKD1", "care")) == 100.0)
    val sums = got.groupBy("nuts_2_code").agg(sum("percentage").as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.forall(s => math.abs(s - 100.0) < 1e-9))
  }

  test("mostCommon is deterministic under ties") {
    val df = (1 to 3).flatMap(i => Seq(s"k$i", s"k$i")).toDF("k")
    val got = Indicators.mostCommon(df, "k", 2).collect().map(_.getString(0))
    assert(got.toSeq == Seq("k1", "k2")) // tie broken by key ascending
  }

  test("weeklyAds expands each ad into its windows and dedups per window") {
    val ads = Seq(
      ("a", "London", "long description", ts("2021-02-02")),
      ("b", "London", "long description", ts("2021-02-03")),
    ).toDF("id", "job_location_raw", "description", "created")
    val links = Seq(("a", "b", 0.99)).toDF("first_id", "second_id", "weight")
    val got = Getters.weeklyAds(spark, ads, links,
      java.time.LocalDate.parse("2021-02-08"),
      java.time.LocalDate.parse("2021-02-15"),
      splitByLocation = false)
    // both Mondays' windows contain both ads; b is the duplicate each time
    val byWeek = got.select("week_date", "id").collect()
      .map(r => (r.getDate(0).toString, r.getString(1)))
    assert(byWeek.toSet == Set(("2021-02-08", "a"), ("2021-02-15", "a")))
  }
}
