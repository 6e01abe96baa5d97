package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Scalar-function surface (SURVEY.md §2.7 F1–F14), all codegen'd
  * `functions._` column algebra — no UDFs in the hot path.
  */
object ScalarFns {

  /** Exact-2dp money: cast through decimal (deterministic in both
    * engines, unlike `round(double, 2)` whose tie-handling can differ).
    */
  private def money(c: Column): Column =
    c.cast(DecimalType(18, 2)).cast(DoubleType)

  private val f1 = Q(
    "f1_regexp_extract",
    (s, d) =>
      // dataLayer-style field extraction (ref flows/extract/reed.py:126-145)
      Tables(s, d).events
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k")),
    Some(
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
        |FROM events""".stripMargin),
  )

  private val f3 = Q(
    "f3_dayfirst_dates",
    (s, d) =>
      // day-first format round-trip (ref tasks/extract.py:125)
      Tables(s, d).orders
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "dd-MM-yyyy").as("day_first"),
          to_date(date_format(col("o_orderdate"), "dd-MM-yyyy"), "dd-MM-yyyy")
            .as("reparsed")),
    Some(
      """SELECT o_orderkey, strftime(o_orderdate, '%d-%m-%Y') AS day_first,
        |  CAST(strptime(strftime(o_orderdate, '%d-%m-%Y'), '%d-%m-%Y') AS DATE)
        |    AS reparsed
        |FROM orders""".stripMargin),
  )

  private val f4 = Q(
    "f4_salary_rule_chain",
    (s, d) => {
      // the reference's salary normalisation shape (flows/enrich/labs/
      // salaries/common.py:9-89): unit→annualisation factor, min/max
      // ordering via least/greatest, cap rule, exact-2dp output — pure
      // when/otherwise column algebra, no UDF.
      val rate = when(col("o_orderpriority") === "1-URGENT", lit("HOUR"))
        .when(col("o_orderpriority") === "2-HIGH", lit("DAY"))
        .otherwise(lit("YEAR"))
      // integer annualisation multipliers keep 2-dp inputs at ≤2 dp, so
      // the exact-decimal cast never lands on a rounding-tie boundary
      // (engines disagree there)
      val mult = when(col("rate") === "HOUR", lit(1950.0))
        .when(col("rate") === "DAY", lit(260.0))
        .otherwise(lit(1.0))
      val raw = col("o_totalprice")
      Tables(s, d).orders
        .withColumn("rate", rate)
        .withColumn("annualised",
          money(least(raw * mult, lit(1.0e9))))
        .withColumn("lo", money(least(raw, lit(100000.0))))
        .withColumn("hi", money(greatest(raw, lit(100000.0))))
        .select("o_orderkey", "rate", "annualised", "lo", "hi")
    },
    Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 'HOUR'
        |       WHEN o_orderpriority = '2-HIGH' THEN 'DAY'
        |       ELSE 'YEAR' END AS rate,
        |  CAST(CAST(least(o_totalprice *
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1950.0
        |         WHEN o_orderpriority = '2-HIGH' THEN 260.0
        |         ELSE 1.0 END, 1e9) AS DECIMAL(18,2)) AS DOUBLE)
        |    AS annualised,
        |  CAST(CAST(least(o_totalprice, 100000.0) AS DECIMAL(18,2))
        |    AS DOUBLE) AS lo,
        |  CAST(CAST(greatest(o_totalprice, 100000.0) AS DECIMAL(18,2))
        |    AS DOUBLE) AS hi
        |FROM orders""".stripMargin),
  )

  private val f8 = Q(
    "f8_short_hash",
    (s, d) =>
      // md5 16-char short hash (ref flows/pre_enrich/soc_lookup.py:20-25)
      Tables(s, d).customer
        .select(col("c_custkey"),
          substring(md5(col("c_name")), 1, 16).as("short_hash")),
    Some(
      "SELECT c_custkey, substr(md5(c_name), 1, 16) AS short_hash FROM customer"),
  )

  private val f10 = Q(
    "f10_region_consolidation",
    (s, d) =>
      // London-NUTS2→UKI-style consolidation with unmatched default
      // (ref flows/aggregate/common.py:31-33,268-278)
      Tables(s, d).nation
        .join(broadcast(Tables(s, d).region),
          col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("n_name"),
          when(col("r_name").isin("ASIA", "AFRICA"), lit("EASTERN"))
            .when(col("r_name") === "EUROPE", lit("EU"))
            .otherwise(coalesce(col("r_name"), lit("ZZZ1"))).as("zone")),
    Some(
      """SELECT n_name,
        |  CASE WHEN r_name IN ('ASIA','AFRICA') THEN 'EASTERN'
        |       WHEN r_name = 'EUROPE' THEN 'EU'
        |       ELSE COALESCE(r_name, 'ZZZ1') END AS zone
        |FROM nation LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin),
  )

  private val f11 = Q(
    "f11_word_boundary_rlike",
    (s, d) =>
      // requires-degree-style \b regex predicate (ref flows/enrich/labs/
      // requires_degree/model/__init__.py:7-37)
      Tables(s, d).documents
        .filter(col("text").rlike("\\b(join|merge)\\b"))
        .select("doc_id", "lang"),
    Some(
      """SELECT doc_id, lang FROM documents
        |WHERE regexp_matches(text, '\b(join|merge)\b')""".stripMargin),
  )

  private val f12 = Q(
    "f12_extract_else_default",
    (s, d) =>
      // outcode-extract-else-cleaned-name pattern (ref flows/enrich/labs/
      // locations/regex/regex_utils.py:19-34)
      Tables(s, d).documents
        .select(col("doc_id"),
          when(col("text").rlike("spark [a-z]+"),
            regexp_extract(col("text"), "(spark [a-z]+)", 1))
            .otherwise(lit("none")).as("extracted")),
    Some(
      """SELECT doc_id,
        |  CASE WHEN regexp_matches(text, 'spark [a-z]+')
        |       THEN regexp_extract(text, '(spark [a-z]+)', 1)
        |       ELSE 'none' END AS extracted
        |FROM documents""".stripMargin),
  )

  private val f14 = Q(
    "f14_isoweek_arithmetic",
    (s, d) =>
      // isoweek/universal-week arithmetic (ref dqa/s3_counts_utils.py:104-137)
      Tables(s, d).orders
        .select(date_trunc("week", col("o_orderdate")).cast("date").as("monday"))
        .groupBy("monday")
        .agg(count(lit(1)).as("n"))
        .select(col("monday"), year(col("monday")).as("yr"),
          weekofyear(col("monday")).as("iso_week"), col("n")),
    Some(
      """SELECT monday, CAST(year(monday) AS INT) AS yr,
        |  CAST(weekofyear(monday) AS INT) AS iso_week, n
        |FROM (
        |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS monday,
        |         count(*) AS n
        |  FROM orders GROUP BY 1)""".stripMargin),
  )

  /** JSON path extraction over a string column — the semi-structured
    * surface (the reference stores JSON chunks in S3 and dict payloads in
    * ORM columns; an engine needs the column-level form). Both the
    * untyped path getter and the schema'd parse, codegen'd map stages.
    */
  private val f15 = Q(
    "f15_json_extract",
    (s, d) => {
      val schema = "k INT"
      Tables(s, d).events
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_path"),
          from_json(col("props"), org.apache.spark.sql.types.StructType
            .fromDDL(schema)).getField("k").as("k_typed"))
        .filter(col("k_path") > 50)
    },
    Some(
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
        |  CAST(json_extract(props, '$.k') AS INT) AS k_typed
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50"""
        .stripMargin),
  )

  /** Z-order (Morton) key over two dimensions — the multi-column
    * data-skipping layout: writing files sorted by the interleaved key
    * makes parquet row-group min/max stats selective on BOTH dimensions
    * at once, so a filter on either (or a box on both) prunes row
    * groups, where a lexicographic (a, b) sort only prunes on `a`. Pure
    * bit arithmetic (8 bits per dimension here), codegen'd shifts —
    * replayed in SQL with the same integer ops. The registered query
    * keys orders by (order-week, customer) and ranks a bounded slice so
    * the interleaving itself is under the hash gate.
    */
  def zorder8(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 8).map { k =>
      shiftleft(shiftright(a, k).bitwiseAND(1), 2 * k) +
        shiftleft(shiftright(b, k).bitwiseAND(1), 2 * k + 1)
    }.reduce(_ + _)

  private val f16 = Q(
    "f16_zorder_key",
    (s, d) => {
      val week = floor(datediff(to_date(col("o_orderdate")),
        to_date(lit("1970-01-01"))) / 7).bitwiseAND(255)
      val cust = col("o_custkey").bitwiseAND(255)
      graft.Tables(s, d).orders
        .select(col("o_orderkey"), zorder8(week, cust).as("z"))
        .orderBy(asc("z"), asc("o_orderkey")).limit(100)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(asc("z"), asc("o_orderkey"))))
    },
    Some {
      val zBits = (0 until 8).map { k =>
        s"(((w // ${1 << k}) % 2) * ${1L << (2 * k)}" +
          s" + ((c // ${1 << k}) % 2) * ${1L << (2 * k + 1)})"
      }.mkString(" + ")
      s"""WITH b AS (
         |  SELECT o_orderkey,
         |    ((CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7) % 256
         |      AS w,
         |    o_custkey % 256 AS c
         |  FROM orders)
         |SELECT o_orderkey, $zBits AS z,
         |  CAST(row_number() OVER (ORDER BY $zBits, o_orderkey) AS INT)
         |    AS rank
         |FROM b
         |ORDER BY z, o_orderkey LIMIT 100""".stripMargin
    },
  )

  def all: Seq[Q] = Seq(f1, f3, f4, f8, f10, f11, f12, f14, f15, f16)
}
