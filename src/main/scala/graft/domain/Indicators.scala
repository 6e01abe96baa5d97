package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The six published indicators (SURVEY §2.4 A1–A7; reference
  * flows/aggregate), each ~10 lines of groupBy/agg over the weekly
  * snapshot view.
  */
object Indicators {
  // Stock index: average of the 4 weeks from Monday 2021-04-05
  // (flows/aggregate/common.py:25-28)
  val StockWeeks = 4
  val London: Seq[String] = Seq("UKI3", "UKI4", "UKI5", "UKI6", "UKI7")
  val DefaultLocationCode = "ZZZ1"
  val DefaultLocationName = "Unmatched"

  /** F10: consolidate London NUTS2 codes, default unmatched ads
    * (flows/aggregate/common.py:268-278).
    */
  def standardiseLocation(df: DataFrame): DataFrame =
    df
      .withColumn("nuts_2_name",
        when(col("nuts_2_code").isin(London: _*), "London")
          .when(col("nuts_2_code").isNull, DefaultLocationName)
          .otherwise(col("nuts_2_name")))
      .withColumn("nuts_2_code",
        when(col("nuts_2_code").isin(London: _*), "UKI")
          .when(col("nuts_2_code").isNull, DefaultLocationCode)
          .otherwise(col("nuts_2_code")))

  /** A7 numerator-side: overall index = count(stock window ads) / 4. */
  def stockIndex(stockWindowAds: DataFrame): DataFrame =
    stockWindowAds.agg(
      (count(lit(1)).cast("double") / StockWeeks).as("index_value"))

  /** A7 per-code index lookup (`_get_index_stock_lookup`). */
  def stockIndexByCode(stockWindowAds: DataFrame, code: String): DataFrame =
    stockWindowAds
      .filter(col(code).isNotNull)
      .groupBy(code)
      .agg((count(lit(1)).cast("double") / StockWeeks).as("code_index"))

  /** weekly_stock: volume of ads per week as % of the stock index. */
  def weeklyStock(weeklyAds: DataFrame, indexValue: Double): DataFrame =
    weeklyAds
      .groupBy(col("week_date"))
      .agg(count(lit(1)).as("n"))
      .select(col("week_date").as("date"),
        (col("n") * 100.0 / indexValue).as("volume_idx"))

  /** As above, but the index arrives as the one-row frame `stockIndex`
    * returns, broadcast into the plan — no driver-side `.head()` fetch
    * and literal re-injection; the whole pipeline stays one lazy plan.
    */
  def weeklyStock(weeklyAds: DataFrame, index: DataFrame): DataFrame =
    weeklyAds
      .groupBy(col("week_date"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(index))
      .select(col("week_date").as("date"),
        (col("n") * 100.0 / col("index_value")).as("volume_idx"))

  /** weekly_loc_vacancies: per-location weekly volume vs per-location
    * index (weekly_stock.py:92-109). locIndex = stockIndexByCode output.
    */
  def weeklyLocVacancies(weeklyAdsStdLoc: DataFrame,
      locIndex: DataFrame): DataFrame =
    weeklyAdsStdLoc
      .filter(col("nuts_2_code").isNotNull)
      .groupBy("week_date", "nuts_2_name", "nuts_2_code")
      .agg(count(lit(1)).as("n"))
      .join(broadcast(locIndex), Seq("nuts_2_code"))
      .select(col("week_date").as("date"),
        col("nuts_2_name").as("location_name"),
        col("nuts_2_code").as("location_code"),
        (col("n") * 100.0 / col("code_index")).as("volume_idx"))

  /** SURVEY §7.4 scale lever: exact `percentile` by default (numpy /
    * oracle parity); flip to `percentile_approx` when a single group's
    * value set outgrows its aggregation buffer at extreme scale.
    */
  @volatile var exactQuantiles: Boolean = true

  /** A4: the reference's quantile block (iterquantiles) — exact
    * 25/50/75 percentiles of min/max annualised salary in £000, nulls
    * filtered, empty → 0 (flows/aggregate/common.py:235-248).
    */
  private def quantileCols(bound: String): Seq[Column] = {
    val c = col(s"${bound}_annualised_salary")
    Seq(0.25 -> "lower_quartile", 0.50 -> "median", 0.75 -> "upper_quartile")
      .map { case (q, label) =>
        val p =
          if (exactQuantiles) percentile(c, lit(q))
          else percentile_approx(c, lit(q), lit(10000))
        (coalesce(p, lit(0.0)) / 1000.0)
          .as(s"${label}_${bound}_salaries_k")
      }
  }

  /** weekly_salary_spread: quantiles of salaries per week. */
  def weeklySalarySpread(weeklyAds: DataFrame): DataFrame =
    weeklyAds
      .groupBy(col("week_date").as("date"))
      .agg(quantileCols("min").head,
        (quantileCols("min").tail ++ quantileCols("max")): _*)

  /** jobs_by_locs (A1): ad count per location code. */
  def jobsByLocation(adsWithLoc: DataFrame): DataFrame =
    adsWithLoc
      .filter(col("nuts_2_code").isNotNull)
      .groupBy("nuts_2_code", "nuts_2_name")
      .agg(count(lit(1)).as("n_ads"))

  /** A5: the top-n most common values of `key` (deterministic
    * tiebreak), as a one-column frame for semi joins (P8).
    */
  def mostCommon(df: DataFrame, key: String, n: Int): DataFrame =
    df.filter(col(key).isNotNull)
      .groupBy(key).count()
      .orderBy(desc("count"), asc(key))
      .limit(n)
      .select(key)

  /** skill_demand_snapshot (A3+A5): count of ads per skill cluster in
    * the snapshot, restricted to the top-n clusters.
    */
  def skillDemand(snapshotSkills: DataFrame, cluster: String = "cluster_0",
      topN: Int = 50): DataFrame =
    snapshotSkills
      .join(broadcast(mostCommon(snapshotSkills, cluster, topN)),
        Seq(cluster), "left_semi")
      .groupBy(cluster)
      .agg(count(lit(1)).as("n_ads"))

  /** A6 — aggregate_skills (flows/aggregate/common.py:286-314): % of a
    * code's ads having each skill cluster; window-agg form, no
    * second aggregation pass.
    */
  def aggregateSkills(jobAds: DataFrame, code: String, name: String,
      cluster: String = "cluster_0"): DataFrame = {
    val byCode = Window.partitionBy(code)
    jobAds
      .filter(col(cluster).isNotNull)
      .groupBy(col(code), col(name), col(cluster))
      .agg(count(lit(1)).as("n"))
      .withColumn("percentage",
        col("n") * 100.0 / sum(col("n")).over(byCode))
      .drop("n")
  }

  /** skill_salary_spread_snapshot (A4+A5+P8): per top-50 skill cluster,
    * salary quantiles of its ads.
    */
  def skillSalarySpread(snapshotAdsWithSkills: DataFrame,
      cluster: String = "cluster_0", topN: Int = 50): DataFrame =
    snapshotAdsWithSkills
      .join(broadcast(mostCommon(snapshotAdsWithSkills, cluster, topN)),
        Seq(cluster), "left_semi")
      .groupBy(col(cluster))
      .agg(quantileCols("min").head,
        (quantileCols("min").tail ++ quantileCols("max")): _*)
}
