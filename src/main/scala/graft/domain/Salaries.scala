package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salary normalisation (SURVEY §2.7 F4) — the reference's
  * `extract_salary` rule chain (flows/enrich/labs/salaries/common.py:9-89)
  * as pure column algebra. Golden-tested 1:1 against the reference's 13
  * pytest cases (labs/salaries/tests/test_common.py:79-196).
  *
  * Rules, in reference order:
  *  1. no rate → excluded;  2. explicit non-GBP currency → excluded;
  *  3. min/max default to `raw_salary`, then sorted;
  *  4. annualise (DAY×260, HOUR×1950=37.5h×52, YEAR×1);
  *  5. max_annual < minimum wage (4.20×1950 = 8190) → excluded;
  *  6. min_annual < minimum wage → symmetrise up to max;
  *  7. disparity > 10×: cap the max down if extreme (>500k) else raise
  *     the min;  8. max_annual still > 500k → excluded.
  *
  * Pure map stage — no shuffle; at 100 TB this fuses into the scan.
  */
object Salaries {
  val WeeksInYear = 52
  val WorkdaysPerWeek = 5
  val HoursPerWeek = 37.5
  val PerAnnumRate: Map[String, Double] = Map(
    "DAY" -> WorkdaysPerWeek * WeeksInYear,
    "HOUR" -> HoursPerWeek * WeeksInYear,
    "YEAR" -> 1.0,
  )
  val MinSalary: Double = 4.20 * PerAnnumRate("HOUR") // 8190: apprentice min wage
  val MinSalaryDisparity = 10
  val MaxSalary = 500000.0

  private def rateMult(rate: Column): Column =
    when(rate === "DAY", PerAnnumRate("DAY"))
      .when(rate === "HOUR", PerAnnumRate("HOUR"))
      .when(rate === "YEAR", PerAnnumRate("YEAR"))

  /** Appends (min_salary, max_salary, min_annualised_salary,
    * max_annualised_salary, rate); all null when the ad is excluded.
    * Input columns: raw_salary, raw_min_salary, raw_max_salary,
    * raw_salary_unit, raw_salary_currency.
    */
  def extractSalary(ads: DataFrame): DataFrame = {
    val rate = col("raw_salary_unit")
    val mult = rateMult(rate)
    val mn0 = coalesce(col("raw_min_salary"), col("raw_salary"))
    val mx0 = coalesce(col("raw_max_salary"), col("raw_salary"))
    val mn = least(mn0, mx0)
    val mx = greatest(mn0, mx0)
    val minAnnual0 = mn * mult
    val maxAnnual = mx * mult
    // rule 6: symmetrise a nonsensical min
    val minAnnual1 = when(minAnnual0 < MinSalary, maxAnnual)
      .otherwise(minAnnual0)
    // rule 7: vast range — cap max down if extreme, else raise min
    val disparity = maxAnnual / minAnnual1 > MinSalaryDisparity
    val maxAnnual2 = when(disparity && maxAnnual > MaxSalary, minAnnual1)
      .otherwise(maxAnnual)
    val minAnnual2 = when(disparity && !(maxAnnual > MaxSalary), maxAnnual)
      .otherwise(minAnnual1)
    val excluded = rate.isNull || mult.isNull ||
      (col("raw_salary_currency").isNotNull &&
        col("raw_salary_currency") =!= "GBP") ||
      mx.isNull ||
      maxAnnual < MinSalary || // rule 5 (pre-correction max)
      maxAnnual2 > MaxSalary // rule 8 (post-correction max)
    def keep(c: Column): Column = when(!excluded, c)
    ads
      .withColumn("min_salary", keep(round(minAnnual2 / mult, 2)))
      .withColumn("max_salary", keep(round(maxAnnual2 / mult, 2)))
      .withColumn("min_annualised_salary", keep(round(minAnnual2, 2)))
      .withColumn("max_annualised_salary", keep(round(maxAnnual2, 2)))
      .withColumn("rate", keep(rate))
  }
}
