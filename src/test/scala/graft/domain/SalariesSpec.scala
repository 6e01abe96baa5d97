package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.Row

/** 1:1 port of the reference's golden salary tests
  * (flows/enrich/labs/salaries/tests/test_common.py:79-196) — every guard
  * branch of the rule chain.
  */
case class SalaryIn(
    raw_salary: Option[Double],
    raw_min_salary: Option[Double],
    raw_max_salary: Option[Double],
    raw_salary_unit: Option[String],
    raw_salary_currency: Option[String],
)

class SalariesSpec extends SparkSpec {
  import Salaries._
  private type In = SalaryIn
  private val In = SalaryIn

  private def run(in: In): Option[(Double, Double, Double, Double, String)] = {
    import spark.implicits._
    val out = extractSalary(Seq(in).toDF())
      .select("min_salary", "max_salary", "min_annualised_salary",
        "max_annualised_salary", "rate")
      .head()
    if (out.isNullAt(0)) None
    else Some((out.getDouble(0), out.getDouble(1), out.getDouble(2),
      out.getDouble(3), out.getString(4)))
  }

  private val yearly = In(Some(15000.0), Some(10000.0), Some(20000.0),
    Some("YEAR"), Some("GBP"))

  test("rate constants guard (test_rate)") {
    assert(PerAnnumRate == Map("DAY" -> 260.0, "HOUR" -> 1950.0, "YEAR" -> 1.0))
    assert(MinSalary > 8000 && MinSalary < 10000)
  }

  test("yearly / daily / hourly golden values") {
    assert(run(yearly).contains((10000.0, 20000.0, 10000.0, 20000.0, "YEAR")))
    val daily = In(Some(15000.0 / 260), Some(10000.0 / 260),
      Some(20000.0 / 260), Some("DAY"), Some("GBP"))
    assert(run(daily).contains((38.46, 76.92, 10000.0, 20000.0, "DAY")))
    val hourly = In(Some(15000.0 / 1950), Some(10000.0 / 1950),
      Some(20000.0 / 1950), Some("HOUR"), Some("GBP"))
    assert(run(hourly).contains((5.13, 10.26, 10000.0, 20000.0, "HOUR")))
  }

  test("no min/max falls back to raw_salary") {
    assert(run(yearly.copy(raw_min_salary = None, raw_max_salary = None))
      .contains((15000.0, 15000.0, 15000.0, 15000.0, "YEAR")))
  }

  test("wrong min/max order is sorted") {
    assert(run(yearly.copy(raw_min_salary = Some(25000.0),
      raw_max_salary = Some(15000.0)))
      .contains((15000.0, 25000.0, 15000.0, 25000.0, "YEAR")))
  }

  test("null currency defaults to GBP; other currencies excluded") {
    assert(run(yearly.copy(raw_salary_currency = None))
      .contains((10000.0, 20000.0, 10000.0, 20000.0, "YEAR")))
    for (cur <- Seq("EUR", "USD", "other"))
      assert(run(yearly.copy(raw_salary_currency = Some(cur))).isEmpty)
  }

  test("no rate excluded") {
    assert(run(yearly.copy(raw_salary_unit = None)).isEmpty)
  }

  test("max below minimum wage excluded") {
    assert(run(yearly.copy(raw_min_salary = Some(0.0),
      raw_max_salary = Some(7000.0))).isEmpty)
  }

  test("min below minimum wage symmetrised up") {
    assert(run(yearly.copy(raw_min_salary = Some(7000.0),
      raw_max_salary = Some(12000.0)))
      .contains((12000.0, 12000.0, 12000.0, 12000.0, "YEAR")))
  }

  test("disparity with extreme max lowers the upper band") {
    assert(run(yearly.copy(raw_min_salary = Some(9000.0),
      raw_max_salary = Some(1000000.0)))
      .contains((9000.0, 9000.0, 9000.0, 9000.0, "YEAR")))
  }

  test("disparity under the cap raises the lower band") {
    assert(run(yearly.copy(raw_min_salary = Some(9000.0),
      raw_max_salary = Some(400000.0)))
      .contains((400000.0, 400000.0, 400000.0, 400000.0, "YEAR")))
  }

  test("extreme min and max excluded") {
    assert(run(yearly.copy(raw_min_salary = Some(600000.0),
      raw_max_salary = Some(7000000.0))).isEmpty)
  }
}
