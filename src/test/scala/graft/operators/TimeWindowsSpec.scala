package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import java.time.LocalDate

/** Golden tests ported from dqa/tests/test_data_getters.py:37-76. */
class TimeWindowsSpec extends AnyFunSuite {
  import TimeWindows._

  private def d(s: String): LocalDate = LocalDate.parse(s)

  test("mondayOfWeek golden values (test_monday_of_week)") {
    val cases = Seq(
      "2021-11-07" -> "2021-11-01",
      "2021-11-08" -> "2021-11-08", // a Monday
      "2021-11-09" -> "2021-11-08",
      "2021-11-10" -> "2021-11-08",
      "2021-11-11" -> "2021-11-08",
      "2021-11-12" -> "2021-11-08",
      "2021-11-13" -> "2021-11-08",
      "2021-11-14" -> "2021-11-08",
      "2021-11-15" -> "2021-11-15",
      "2021-11-16" -> "2021-11-15",
      "2021-11-17" -> "2021-11-15",
      "2012-01-05" -> "2012-01-02",
      "1997-02-17" -> "1997-02-17",
    )
    cases.foreach { case (in, out) =>
      assert(mondayOfWeek(d(in)) == d(out), s"for $in")
    }
  }

  test("iterdates golden list (test_iterdates)") {
    val got = iterdates(d("2021-02-01"), d("2021-03-01"), timespanWeeks = 2)
    val want = Seq(
      (d("2021-01-18"), d("2021-02-01")),
      (d("2021-01-25"), d("2021-02-08")),
      (d("2021-02-01"), d("2021-02-15")),
      (d("2021-02-08"), d("2021-02-22")),
      (d("2021-02-15"), d("2021-03-01")),
    )
    assert(got == want)
  }

  test("snapshot anchor = 15th of previous month") {
    assert(snapshotAnchor(d("2021-11-20")) == d("2021-10-15"))
    assert(snapshotAnchor(d("2021-01-05")) == d("2020-12-15"))
    assert(snapshotAnchor(d("2021-03-31")) == d("2021-02-15"))
  }

  test("dateSpine is inclusive and stepped") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val rows = dateSpine(spark, d("2021-02-01"), d("2021-03-01"), 7)
      .collect().map(_.getDate(0).toLocalDate)
    assert(rows.toSeq == Seq(d("2021-02-01"), d("2021-02-08"),
      d("2021-02-15"), d("2021-02-22"), d("2021-03-01")))
  }
}
