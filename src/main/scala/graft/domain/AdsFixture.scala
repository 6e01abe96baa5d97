package graft.domain

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ads-shaped fixture VIEWS derived deterministically from the driver's
  * TPC-H-ish tables, so the REAL domain operators (Salaries,
  * DedupPipeline, Getters, Indicators) can run under the DuckDB oracle
  * gate: the Spark side builds each view with column algebra, and
  * [[AdsFixture.SQL]] holds the character-equivalent DuckDB CTEs — every
  * `dom_*` oracle starts from the same derived tables.
  *
  * Shapes mirror FIXTURES.md (reference `orms/raw_jobs.py:14-39`,
  * `orms/link_tables.py:32-41,89-105`, `orms/std_features.py:96-119`):
  *
  *  - `ads`: one job ad per order; salary fields constructed as
  *    integer + cents so every value is exactly representable at 2 dp —
  *    annualisation (×260/×1950) keeps ≤2 dp, so `round(x, 2)` never
  *    hits a tie where engines disagree. Branch selectors (orderkey mod
  *    k) cover every rule of the salary chain: missing unit, non-GBP,
  *    null min/max/salary, swapped bounds, sub-minimum-wage,
  *    disparity correction both ways, >500k cap.
  *  - `links`: duplicate edge list chaining each customer's consecutive
  *    orders with weight (id%11)/100+0.90 — the 0.95 band keeps ~half,
  *    so components are maximal runs of consecutive orders, which the
  *    oracle recomputes independently with window functions (no
  *    recursion needed — the graph is a union of paths).
  *  - `location_links`/`locations`: customer nation → NUTS-ish dim with
  *    some unmatched codes (F10 default branch) and some London-coded
  *    (UKI3..UKI7 consolidation branch).
  *  - `soc_links`/`socs`, `skill_links`: per-ad SOC and per-lineitem
  *    skill rows for J6 feature assembly and A6 skill aggregation.
  */
object AdsFixture {

  // ---- Spark-side views -------------------------------------------------

  def ads(t: Tables): DataFrame = {
    val k = col("o_orderkey")
    val cents = (k % 100) / 100.0
    t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .select(
        k.as("id"),
        col("o_orderdate").as("created"),
        col("o_orderpriority").as("job_location_raw"),
        when(k % 19 === 0, lit("ad"))
          .otherwise(concat(col("o_orderstatus"), lit(" role in "),
            col("n_name"))).as("description"),
        when(k % 5 =!= 0, (k * 7) % 90000 + cents).as("raw_salary"),
        when(k % 3 =!= 0, (k * 13) % 100000 + cents).as("raw_min_salary"),
        when(k % 7 =!= 0, (k * 11) % 100000 + cents).as("raw_max_salary"),
        when(k % 4 === 0, "YEAR").when(k % 4 === 1, "DAY")
          .when(k % 4 === 2, "HOUR").as("raw_salary_unit"),
        when(k % 6 === 0, "USD").when(k % 6 =!= 1, "GBP")
          .as("raw_salary_currency"),
      )
  }

  def links(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("id")
    val ranked = t.orders.select(col("o_orderkey").as("id"), col("o_custkey"))
      .withColumn("rn", row_number().over(w))
    ranked.alias("a")
      .join(ranked.alias("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("b.rn") === col("a.rn") + 1)
      .select(col("a.id").as("first_id"), col("b.id").as("second_id"),
        ((col("a.id") % 11) / 100.0 + 0.90).as("weight"))
  }

  def locationLinks(t: Tables): DataFrame =
    t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("job_id"),
        when(col("o_orderkey") % 17 === 0, lit("XX"))
          .otherwise(col("c_nationkey").cast("string")).as("location_id"))

  def locations(t: Tables): DataFrame =
    t.nation
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .select(
        col("n_nationkey").cast("string").as("ipn_18_code"),
        col("n_name").as("ipn_18_name"),
        when(col("n_regionkey") === 0,
          concat(lit("UKI"), (col("n_nationkey") % 10).cast("string")))
          .otherwise(concat(lit("UK"), col("n_regionkey").cast("string")))
          .as("nuts_2_code"),
        col("r_name").as("nuts_2_name"),
      )

  def socLinks(t: Tables): DataFrame =
    t.orders.select(col("o_orderkey").as("job_id"),
      (col("o_orderkey") % 100).as("soc_id"))

  def socs(t: Tables): DataFrame =
    t.orders.select((col("o_orderkey") % 100).as("soc_id")).distinct()
      .select(col("soc_id"),
        concat(lit("SOC"), col("soc_id").cast("string")).as("soc_code"),
        concat(lit("Title "), col("soc_id").cast("string")).as("soc_title"))

  def skillLinks(t: Tables): DataFrame =
    t.lineitem.select(
      col("l_orderkey").as("job_id"),
      concat(col("l_returnflag"), lit("_"),
        col("l_linenumber").cast("string")).as("surface_form"),
      col("l_linestatus").as("preferred_label"),
      (col("l_partkey") % 7).as("cluster_0"))

  // ---- DuckDB-side CTEs (character-equivalent derivations) -------------

  /** CTE bodies keyed by name; oracles compose `WITH ads AS (...), ...`. */
  val SQL: Map[String, String] = Map(
    "ads" ->
      """SELECT o_orderkey AS id, o_orderdate AS created,
        |  o_orderpriority AS job_location_raw,
        |  CASE WHEN o_orderkey % 19 = 0 THEN 'ad'
        |       ELSE o_orderstatus || ' role in ' || n_name END AS description,
        |  CASE WHEN o_orderkey % 5 <> 0
        |       THEN (o_orderkey * 7) % 90000 + (o_orderkey % 100) / 100.0
        |       END AS raw_salary,
        |  CASE WHEN o_orderkey % 3 <> 0
        |       THEN (o_orderkey * 13) % 100000 + (o_orderkey % 100) / 100.0
        |       END AS raw_min_salary,
        |  CASE WHEN o_orderkey % 7 <> 0
        |       THEN (o_orderkey * 11) % 100000 + (o_orderkey % 100) / 100.0
        |       END AS raw_max_salary,
        |  CASE o_orderkey % 4 WHEN 0 THEN 'YEAR' WHEN 1 THEN 'DAY'
        |       WHEN 2 THEN 'HOUR' END AS raw_salary_unit,
        |  CASE WHEN o_orderkey % 6 = 0 THEN 'USD'
        |       WHEN o_orderkey % 6 <> 1 THEN 'GBP' END AS raw_salary_currency
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "lnk_ranked" ->
      """SELECT o_orderkey AS id, o_custkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |FROM orders""".stripMargin,
    "links" ->
      """SELECT a.id AS first_id, b.id AS second_id, a.o_custkey, b.rn AS brn,
        |  (a.id % 11) / 100.0 + 0.90 AS weight
        |FROM lnk_ranked a JOIN lnk_ranked b
        |  ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1""".stripMargin,
    // banded edges + components of the banded chain graph, computed
    // independently of the engine's large/small-star iteration: a node
    // starts a new run iff it has no in-band incoming edge; component =
    // min id of the (customer, run); nodes with no in-band edge at all
    // are not part of any component (CC defaults nodeSet to endpoints)
    "banded" ->
      "SELECT * FROM links WHERE weight BETWEEN 0.95 AND 1.0",
    "comps" ->
      """SELECT id, min(id) OVER (PARTITION BY o_custkey, run_id) AS component
        |FROM (
        |  SELECT id, o_custkey, isolated,
        |    sum(is_start) OVER (PARTITION BY o_custkey ORDER BY rn) AS run_id
        |  FROM (
        |    SELECT r.id, r.o_custkey, r.rn,
        |      CASE WHEN ein.second_id IS NULL THEN 1 ELSE 0 END AS is_start,
        |      CASE WHEN ein.second_id IS NULL AND eout.first_id IS NULL
        |           THEN 1 ELSE 0 END AS isolated
        |    FROM lnk_ranked r
        |    LEFT JOIN banded ein ON ein.second_id = r.id
        |    LEFT JOIN banded eout ON eout.first_id = r.id))
        |WHERE isolated = 0""".stripMargin,
    "location_links" ->
      """SELECT o_orderkey AS job_id,
        |  CASE WHEN o_orderkey % 17 = 0 THEN 'XX'
        |       ELSE CAST(c_nationkey AS VARCHAR) END AS location_id
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "locations" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS ipn_18_code,
        |  n_name AS ipn_18_name,
        |  CASE WHEN n_regionkey = 0
        |       THEN 'UKI' || CAST(n_nationkey % 10 AS VARCHAR)
        |       ELSE 'UK' || CAST(n_regionkey AS VARCHAR) END AS nuts_2_code,
        |  r_name AS nuts_2_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "soc_links" ->
      "SELECT o_orderkey AS job_id, o_orderkey % 100 AS soc_id FROM orders",
    "socs" ->
      """SELECT soc_id, 'SOC' || CAST(soc_id AS VARCHAR) AS soc_code,
        |  'Title ' || CAST(soc_id AS VARCHAR) AS soc_title
        |FROM (SELECT DISTINCT o_orderkey % 100 AS soc_id FROM orders)""".stripMargin,
    "skill_links" ->
      """SELECT l_orderkey AS job_id,
        |  l_returnflag || '_' || CAST(l_linenumber AS VARCHAR) AS surface_form,
        |  l_linestatus AS preferred_label,
        |  l_partkey % 7 AS cluster_0
        |FROM lineitem""".stripMargin,
    // the full salary rule chain (Salaries.extractSalary mirrored op-by-op;
    // constants written as the same double expressions Scala evaluates)
    "sal1" ->
      """SELECT *,
        |  CASE raw_salary_unit WHEN 'DAY' THEN 260.0 WHEN 'HOUR' THEN 1950.0
        |       WHEN 'YEAR' THEN 1.0 END AS mult,
        |  least(coalesce(raw_min_salary, raw_salary),
        |        coalesce(raw_max_salary, raw_salary)) AS mn,
        |  greatest(coalesce(raw_min_salary, raw_salary),
        |           coalesce(raw_max_salary, raw_salary)) AS mx
        |FROM ads""".stripMargin,
    "sal2" ->
      "SELECT *, mn * mult AS min_annual0, mx * mult AS max_annual FROM sal1",
    "sal3" ->
      """SELECT *, CASE WHEN min_annual0 < 4.20 * 1950.0 THEN max_annual
        |  ELSE min_annual0 END AS min_annual1 FROM sal2""".stripMargin,
    "sal4" ->
      """SELECT *, (max_annual / min_annual1 > 10) AS disparity,
        |  (max_annual > 500000.0) AS extreme FROM sal3""".stripMargin,
    "sal5" ->
      """SELECT *,
        |  CASE WHEN disparity AND extreme THEN min_annual1
        |       ELSE max_annual END AS max_annual2,
        |  CASE WHEN disparity AND NOT extreme THEN max_annual
        |       ELSE min_annual1 END AS min_annual2
        |FROM sal4""".stripMargin,
    "salaried" ->
      """SELECT *,
        |  (raw_salary_unit IS NULL OR mult IS NULL
        |   OR (raw_salary_currency IS NOT NULL AND raw_salary_currency <> 'GBP')
        |   OR mx IS NULL
        |   OR max_annual < 4.20 * 1950.0
        |   OR max_annual2 > 500000.0) AS excluded
        |FROM sal5""".stripMargin,
  )

  /** `WITH a AS (...), b AS (...)` prefix for the given CTE names, in
    * dependency order.
    */
  def withCtes(names: String*): String =
    names.map(n => s"$n AS (\n${SQL(n)})").mkString("WITH ", ",\n", "\n")
}
