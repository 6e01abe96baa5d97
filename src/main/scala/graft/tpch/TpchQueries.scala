package graft.tpch

import graft.{Q, Tables}
import graft.util.Stable.{davg, davgSql, dsum, dsumSql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H conformance block (SURVEY §5 closure): the 22 queries of the
  * TPC-H specification (public, tpc.org), re-expressed over the driver's
  * TPC-H-ish testdata and this engine's DataFrame conventions.
  *
  * The synthetic schema is a SUBSET of TPC-H (no `partsupp`, no
  * commit/receipt dates, ship modes, containers, phones or comments), so
  * queries touching missing columns are ADAPTED — each adaptation keeps
  * the query's defining plan shape (the reason the suite is worth
  * running: Q2's correlated min subquery, Q4/Q21's (anti-)semi-join
  * chains, Q11/Q15/Q17/Q22's scalar subqueries, Q13's outer-join
  * histogram, Q19's disjunctive pushdown) and swaps only the filter
  * columns. Every adaptation is noted on the query. Revenue/price sums go
  * through [[graft.util.Stable]] so the DuckDB oracle hash-matches
  * bit-for-bit regardless of partitioning — which is also what makes the
  * numbers reproducible run-to-run on a 1000-executor cluster.
  *
  * Scale notes: region/nation (25 rows) are always broadcast; the
  * lineitem side never pre-materialises; LIMIT queries carry a unique
  * tiebreak key so TakeOrderedAndProject is deterministic.
  */
object TpchQueries {

  /** `lineitem`'s (part, supplier) pairs stand in for the missing
    * `partsupp` relation wherever TPC-H reads one (Q2/Q16/Q20).
    */
  private def supply(t: Tables): DataFrame =
    t.lineitem.select(col("l_partkey").as("sp_partkey"),
      col("l_suppkey").as("sp_suppkey")).distinct()

  private val supplySql =
    "SELECT DISTINCT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey FROM lineitem"

  /** Suppliers in a region, nation name attached; dims broadcast. */
  private def regionSuppliers(t: Tables, rName: String): DataFrame =
    t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === rName)),
        col("n_regionkey") === col("r_regionkey"))

  private def revenue: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  private val revenueSql = "l_extendedprice * (1.0 - l_discount)"

  // ---------------------------------------------------------------- Q1
  /** Q1 pricing summary — unmodified (all columns present). One pushed
    * shipdate filter + one hash aggregate; the flagship `a3` is this
    * query's reduced form.
    */
  private val q01 = Q(
    "tpch_q01",
    (s, d) => {
      // The disc-price/charge PRODUCTS are computed in exact decimal, not
      // double: price/discount/tax are true 2-dp decimals, so quantizing
      // each FACTOR to decimal first makes the product and its sum exact
      // in both engines. Summing the double product and casting (dsum)
      // is not enough here — a double product can land within half an
      // ulp of a .xxxx5 tie, and Spark (exact-binary BigDecimal) and
      // DuckDB (scaled double multiply) then round it differently; at
      // 60k rows the 3-factor charge term hits such ties (measured).
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val priceD = col("l_extendedprice").cast(DecimalType(12, 2))
      val oneD = lit(1).cast(DecimalType(3, 2))
      val discF = oneD - col("l_discount").cast(DecimalType(3, 2))
      val taxF = oneD + col("l_tax").cast(DecimalType(3, 2))
      Tables(s, d).lineitem
        .filter(col("l_shipdate") <= "2001-08-06")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(priceD * discF).cast(DoubleType).as("sum_disc_price"),
          sum(priceD * discF * taxF).cast(DoubleType).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some {
      val priceD = "CAST(l_extendedprice AS DECIMAL(12,2))"
      val discF = "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
      val taxF = "(CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM($priceD * $discF) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM($priceD * $discF * $taxF) AS DOUBLE) AS sum_charge,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_extendedprice")} AS avg_price,
         |  ${davgSql("l_discount", 6)} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin
    },
  )

  // ---------------------------------------------------------------- Q2
  /** Q2 minimum-cost supplier — ADAPTED: `partsupp` → [[supply]], and the
    * correlated MIN is over `s_acctbal` (no `ps_supplycost`). The shape —
    * a correlated scalar subquery decorrelated into a per-part min join —
    * is intact. Dims broadcast; the min side reuses the same supply scan.
    */
  private val q02 = Q(
    "tpch_q02",
    (s, d) => {
      val t = Tables(s, d)
      val euro = supply(t).join(
        regionSuppliers(t, "EUROPE")
          .select("s_suppkey", "s_acctbal", "s_name", "n_name"),
        col("sp_suppkey") === col("s_suppkey"))
      val minBal = euro.groupBy(col("sp_partkey").as("mb_partkey"))
        .agg(min(col("s_acctbal")).as("min_bal"))
      t.part.filter(col("p_size") <= 15 && col("p_type") === "LARGE")
        .join(euro, col("p_partkey") === col("sp_partkey"))
        .join(minBal, col("p_partkey") === col("mb_partkey") &&
          col("s_acctbal") === col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
    },
    Some(
      s"""WITH supply AS ($supplySql)
         |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type
         |FROM part p JOIN supply ON p_partkey = sp_partkey
         |JOIN supplier s ON s_suppkey = sp_suppkey
         |JOIN nation n ON s_nationkey = n_nationkey
         |JOIN region r ON n_regionkey = r_regionkey
         |WHERE p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
         |  AND s_acctbal = (
         |    SELECT min(s2.s_acctbal) FROM supply sp2
         |    JOIN supplier s2 ON s2.s_suppkey = sp2.sp_suppkey
         |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
         |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
         |    WHERE sp2.sp_partkey = p.p_partkey AND r2.r_name = 'EUROPE')""".stripMargin),
  )

  // ---------------------------------------------------------------- Q3
  /** Q3 shipping priority — ADAPTED: no `o_shippriority` column, so it is
    * dropped from the projection; filter/join/topN shape unmodified.
    */
  private val q03 = Q(
    "tpch_q03",
    (s, d) => {
      val t = Tables(s, d)
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders.filter(col("o_orderdate") < "1998-06-01"),
          col("c_custkey") === col("o_custkey"))
        .join(t.lineitem.filter(col("l_shipdate") > "1998-06-01"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue).as("revenue"))
        .orderBy(desc("revenue"), asc("o_orderdate"), asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    },
    Some(
      s"""SELECT l_orderkey, ${dsumSql(revenueSql)} AS revenue, o_orderdate
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin),
  )

  // ---------------------------------------------------------------- Q4
  /** Q4 order priority checking — ADAPTED: "committed late" becomes
    * `l_shipdate > o_orderdate + 60 days` (no commit/receipt dates). The
    * defining EXISTS semi-join over lineitem is intact.
    */
  private val q04 = Q(
    "tpch_q04",
    (s, d) => {
      val t = Tables(s, d)
      t.orders
        .filter(col("o_orderdate") >= "1997-01-01" &&
          col("o_orderdate") < "1997-04-01")
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },
    Some(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin),
  )

  // ---------------------------------------------------------------- Q5
  /** Q5 local-supplier volume — unmodified (the date window widened to
    * the generator's range). The 6-way join keeps nation/region broadcast
    * and the c_nationkey = s_nationkey co-location predicate.
    */
  private val q05 = Q(
    "tpch_q05",
    (s, d) => {
      val t = Tables(s, d)
      t.customer
        .join(t.orders.filter(col("o_orderdate") >= "1995-01-01" &&
          col("o_orderdate") < "1999-01-01"),
          col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(revenue).as("revenue"))
    },
    Some(
      s"""SELECT n_name, ${dsumSql(revenueSql)} AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin),
  )

  // ---------------------------------------------------------------- Q6
  /** Q6 forecasting revenue change — unmodified. Pure pushed-filter scan
    * + single global aggregate; the classic predicate-pushdown probe.
    */
  private val q06 = Q(
    "tpch_q06",
    (s, d) =>
      Tables(s, d).lineitem
        .filter(col("l_shipdate") >= "1997-01-01" &&
          col("l_shipdate") < "1998-01-01" &&
          col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue")),
    Some(
      s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin),
  )

  // ---------------------------------------------------------------- Q7
  /** Q7 volume shipping — ADAPTED: the two-NATION pair becomes a
    * two-REGION pair (the sf0.001 generator populates only 10 of 25
    * nations with suppliers, so nation-level filters are not stable
    * across scales). The symmetric disjunctive join filter is intact.
    */
  private val q07 = Q(
    "tpch_q07",
    (s, d) => {
      val t = Tables(s, d)
      val n1 = broadcast(t.nation.select(col("n_nationkey").as("n1_key"),
        col("n_regionkey").as("n1_rkey")))
      val n2 = broadcast(t.nation.select(col("n_nationkey").as("n2_key"),
        col("n_regionkey").as("n2_rkey")))
      val r1 = broadcast(t.region.select(col("r_regionkey").as("r1_key"),
        col("r_name").as("supp_region")))
      val r2 = broadcast(t.region.select(col("r_regionkey").as("r2_key"),
        col("r_name").as("cust_region")))
      t.supplier
        .join(t.lineitem.filter(col("l_shipdate").between(
          "1996-01-01", "1997-12-31")), col("s_suppkey") === col("l_suppkey"))
        .join(t.orders, col("o_orderkey") === col("l_orderkey"))
        .join(t.customer, col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .join(r1, col("n1_rkey") === col("r1_key"))
        .join(r2, col("n2_rkey") === col("r2_key"))
        .filter((col("supp_region") === "EUROPE" && col("cust_region") === "ASIA") ||
          (col("supp_region") === "ASIA" && col("cust_region") === "EUROPE"))
        .groupBy(col("supp_region"), col("cust_region"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(revenue).as("revenue"))
    },
    Some(
      s"""SELECT supp_region, cust_region, l_year,
         |  ${dsumSql("volume")} AS revenue FROM (
         |  SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
         |    extract(year FROM l_shipdate) AS l_year,
         |    $revenueSql AS volume
         |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
         |  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
         |  WHERE ((r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
         |      OR (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'))
         |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
         |      AND TIMESTAMP '1997-12-31 00:00:00'
         |) shipping GROUP BY supp_region, cust_region, l_year""".stripMargin),
  )

  // ---------------------------------------------------------------- Q8
  /** Q8 national market share — shape unmodified (conditional share of a
    * grouped sum); the tracked nation is NATION_3 (supplier-populated at
    * every scale) and `p_type` uses the generator's 6-value domain.
    */
  private val q08 = Q(
    "tpch_q08",
    (s, d) => {
      val t = Tables(s, d)
      val custNation = broadcast(t.nation.select(
        col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_rkey")))
      val suppNation = broadcast(t.nation.select(
        col("n_nationkey").as("sn_key"), col("n_name").as("nation")))
      t.part.filter(col("p_type") === "ECONOMY")
        .join(t.lineitem, col("p_partkey") === col("l_partkey"))
        .join(t.supplier, col("s_suppkey") === col("l_suppkey"))
        .join(t.orders.filter(col("o_orderdate").between(
          "1996-01-01", "1997-12-31")), col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(custNation, col("c_nationkey") === col("cn_key"))
        .join(broadcast(t.region.filter(col("r_name") === "AMERICA")),
          col("cn_rkey") === col("r_regionkey"))
        .join(suppNation, col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((dsum(when(col("nation") === "NATION_3", revenue)
          .otherwise(lit(0.0))) / dsum(revenue)).as("mkt_share"))
    },
    Some(
      s"""SELECT o_year,
         |  ${dsumSql("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END")}
         |    / ${dsumSql("volume")} AS mkt_share
         |FROM (
         |  SELECT extract(year FROM o_orderdate) AS o_year,
         |    $revenueSql AS volume, n2.n_name AS nation
         |  FROM part JOIN lineitem ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
         |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
         |      AND TIMESTAMP '1997-12-31 00:00:00'
         |) all_nations GROUP BY o_year""".stripMargin),
  )

  // ---------------------------------------------------------------- Q9
  /** Q9 product-type profit — ADAPTED: no `ps_supplycost`, so profit
    * reduces to discounted revenue; the like-filtered part join, supplier
    * nation attribution and (nation, year) rollup are intact.
    */
  private val q09 = Q(
    "tpch_q09",
    (s, d) => {
      val t = Tables(s, d)
      t.part.filter(col("p_name").like("%red%"))
        .join(t.lineitem, col("p_partkey") === col("l_partkey"))
        .join(t.supplier, col("s_suppkey") === col("l_suppkey"))
        .join(t.orders, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(dsum(revenue).as("sum_profit"))
    },
    Some(
      s"""SELECT n_name AS nation, extract(year FROM o_orderdate) AS o_year,
         |  ${dsumSql(revenueSql)} AS sum_profit
         |FROM part JOIN lineitem ON p_partkey = l_partkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY n_name, extract(year FROM o_orderdate)""".stripMargin),
  )

  // --------------------------------------------------------------- Q10
  /** Q10 returned-item reporting — ADAPTED: `c_address/c_phone/c_comment`
    * are absent and dropped from the projection; the R-flag quarter scan
    * and revenue top-20 are unmodified.
    */
  private val q10 = Q(
    "tpch_q10",
    (s, d) => {
      val t = Tables(s, d)
      t.customer
        .join(t.orders.filter(col("o_orderdate") >= "1997-10-01" &&
          col("o_orderdate") < "1998-01-01"),
          col("c_custkey") === col("o_custkey"))
        .join(t.lineitem.filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue).as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    },
    Some(
      s"""SELECT c_custkey, c_name, ${dsumSql(revenueSql)} AS revenue,
         |  c_acctbal, n_name
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
  )

  // --------------------------------------------------------------- Q11
  /** Q11 important stock — ADAPTED: `partsupp` value becomes lineitem
    * revenue per part over one region's suppliers, and TPC-H's
    * scale-DEPENDENT fraction (0.0001/SF) becomes a scale-free
    * `> 1.5 × mean` cut. The defining shape — a grouped sum filtered
    * against a scalar subquery over the SAME grouped sum — is intact.
    * The group frame is computed once and reused via a broadcast 1-row
    * threshold join.
    */
  private val q11 = Q(
    "tpch_q11",
    (s, d) => {
      val t = Tables(s, d)
      val vbp = t.lineitem
        .join(regionSuppliers(t, "EUROPE").select("s_suppkey"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(revenue).as("value"))
      val threshold = vbp.agg((lit(1.5) * davg(col("value"))).as("thr"))
      vbp.join(broadcast(threshold)).filter(col("value") > col("thr"))
        .select("l_partkey", "value")
    },
    Some(
      s"""WITH value_by_part AS (
         |  SELECT l_partkey, ${dsumSql(revenueSql)} AS value
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE' GROUP BY l_partkey)
         |SELECT l_partkey, value FROM value_by_part
         |WHERE value > (SELECT 1.5 * ${davgSql("value")} FROM value_by_part)""".stripMargin),
  )

  // --------------------------------------------------------------- Q12
  /** Q12 shipping-mode priority — ADAPTED: `l_shipmode` → `l_returnflag`
    * (2-value IN filter) and the commit/receipt lateness chain →
    * `l_shipdate > o_orderdate + 30 days`. The two-way conditional
    * aggregation (high/low priority CASE counts) is intact.
    */
  private val q12 = Q(
    "tpch_q12",
    (s, d) => {
      val t = Tables(s, d)
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t.orders
        .join(t.lineitem
          .filter(col("l_returnflag").isin("A", "R") &&
            col("l_shipdate") >= "1997-01-01" &&
            col("l_shipdate") < "1998-01-01"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
    },
    Some(
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag IN ('A','R')
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin),
  )

  // --------------------------------------------------------------- Q13
  /** Q13 customer order-count distribution — ADAPTED: the comment
    * NOT-LIKE filter becomes an `o_orderpriority` exclusion. The defining
    * shape — a LEFT OUTER join whose filter lives in the JOIN CONDITION
    * (not a WHERE), then a count-of-counts histogram — is intact.
    */
  private val q13 = Q(
    "tpch_q13",
    (s, d) => {
      val t = Tables(s, d)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "4-NOT SPECIFIED", "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    },
    Some(
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count""".stripMargin),
  )

  // --------------------------------------------------------------- Q14
  /** Q14 promotion effect — shape unmodified; `p_type LIKE 'PROMO%'`
    * becomes equality on the generator's 6-value type domain.
    */
  private val q14 = Q(
    "tpch_q14",
    (s, d) => {
      val t = Tables(s, d)
      t.lineitem
        .filter(col("l_shipdate") >= "1997-09-01" &&
          col("l_shipdate") < "1997-10-01")
        .join(t.part, col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) * dsum(when(col("p_type") === "PROMO", revenue)
          .otherwise(lit(0.0))) / dsum(revenue)).as("promo_revenue"))
    },
    Some(
      s"""SELECT 100.0 * ${dsumSql(
        s"CASE WHEN p_type = 'PROMO' THEN $revenueSql ELSE 0.0 END")}
         |  / ${dsumSql(revenueSql)} AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin),
  )

  // --------------------------------------------------------------- Q15
  /** Q15 top supplier — unmodified: the revenue view is computed once and
    * self-compared against its own scalar MAX (stable because both sides
    * are the same decimal-exact sums).
    */
  private val q15 = Q(
    "tpch_q15",
    (s, d) => {
      val t = Tables(s, d)
      val rev = t.lineitem
        .filter(col("l_shipdate") >= "1997-01-01" &&
          col("l_shipdate") < "1997-04-01")
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(dsum(revenue).as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("max_rev"))
      t.supplier
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(top), col("total_revenue") === col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    },
    Some(
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    ${dsumSql(revenueSql)} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin),
  )

  // --------------------------------------------------------------- Q16
  /** Q16 supplier relationship — ADAPTED: `partsupp` → [[supply]], the
    * container filter is dropped, and the complaint-comment NOT IN
    * becomes a negative-signal `s_acctbal < 1000` exclusion. The defining
    * shape — distinct-supplier counting per (brand, type, size) minus a
    * NOT IN subquery — is intact (the exclusion list is null-free, so the
    * anti join is NOT IN-equivalent).
    */
  private val q16 = Q(
    "tpch_q16",
    (s, d) => {
      val t = Tables(s, d)
      val excluded = t.supplier.filter(col("s_acctbal") < 1000)
        .select(col("s_suppkey").as("x_suppkey"))
      supply(t)
        .join(broadcast(excluded), col("sp_suppkey") === col("x_suppkey"),
          "left_anti")
        .join(t.part.filter(col("p_brand") =!= "Brand#1" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)),
          col("p_partkey") === col("sp_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("sp_suppkey")).as("supplier_cnt"))
    },
    Some(
      s"""WITH supply AS ($supplySql)
         |SELECT p_brand, p_type, p_size,
         |  count(DISTINCT sp_suppkey) AS supplier_cnt
         |FROM supply JOIN part ON p_partkey = sp_partkey
         |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
         |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
         |  AND sp_suppkey NOT IN
         |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
         |GROUP BY p_brand, p_type, p_size""".stripMargin),
  )

  // --------------------------------------------------------------- Q17
  /** Q17 small-quantity-order revenue — shape unmodified (the correlated
    * per-part AVG subquery, decorrelated into a grouped-avg join; the
    * container filter is dropped and the 0.2 factor is 0.5 so the probe
    * stays non-empty at sf0.001). Quantities are integral doubles, so the
    * plain avg is order-independent and cross-engine exact.
    */
  private val q17 = Q(
    "tpch_q17",
    (s, d) => {
      val t = Tables(s, d)
      val partAvg = t.lineitem.groupBy(col("l_partkey").as("pa_partkey"))
        .agg((lit(0.5) * avg(col("l_quantity"))).as("qty_threshold"))
      t.part.filter(col("p_brand") === "Brand#23")
        .join(t.lineitem, col("p_partkey") === col("l_partkey"))
        .join(partAvg, col("p_partkey") === col("pa_partkey"))
        .filter(col("l_quantity") < col("qty_threshold"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },
    Some(
      s"""SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#23'
         |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
         |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin),
  )

  // --------------------------------------------------------------- Q18
  /** Q18 large-volume customers — unmodified (threshold re-sized to the
    * generator's per-order quantity distribution). The defining IN over a
    * HAVING subquery runs as a self-semi-join on lineitem.
    */
  private val q18 = Q(
    "tpch_q18",
    (s, d) => {
      val t = Tables(s, d)
      val big = t.lineitem.groupBy(col("l_orderkey").as("big_orderkey"))
        .agg(dsum(col("l_quantity")).as("big_qty"))
        .filter(col("big_qty") > 200)
        .select("big_orderkey")
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "o_totalprice")
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(desc("o_totalprice"), asc("o_orderdate"), asc("o_orderkey"))
        .limit(100)
    },
    Some(
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         |  ${dsumSql("l_quantity")} AS sum_qty
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderkey IN (
         |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         |  HAVING ${dsumSql("l_quantity")} > 200)
         |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin),
  )

  // --------------------------------------------------------------- Q19
  /** Q19 discounted revenue — ADAPTED: the container/shipmode/shipinstr
    * legs are dropped, keeping brand × size-range × quantity-range per
    * branch. The defining shape — a disjunction of conjunctive join
    * predicates that must still push the shared `p_partkey = l_partkey`
    * equi-key into a hash join (not a cartesian) — is intact.
    */
  private val q19 = Q(
    "tpch_q19",
    (s, d) => {
      val t = Tables(s, d)
      val branch = (brand: String, sizeHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
          col("l_quantity").between(qLo, qHi)
      t.lineitem
        .join(t.part, col("p_partkey") === col("l_partkey"))
        .filter(branch("Brand#12", 15, 1, 21) ||
          branch("Brand#23", 25, 10, 30) || branch("Brand#3", 35, 20, 40))
        .agg(dsum(revenue).as("revenue"))
    },
    Some(
      s"""SELECT ${dsumSql(revenueSql)} AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 1 AND 21)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |    AND l_quantity BETWEEN 10 AND 30)
         |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
         |    AND l_quantity BETWEEN 20 AND 40)""".stripMargin),
  )

  // --------------------------------------------------------------- Q20
  /** Q20 potential part promotion — ADAPTED: the `partsupp` availability
    * half becomes shipped-quantity-by-supplier (no availqty exists), the
    * part colour is `red` (the generator has no green parts), and the
    * nation filter is region-level (see Q7). The defining shape — nested
    * IN subqueries (suppliers ⊇ shipped-enough ⊇ parts-like) — is intact.
    */
  private val q20 = Q(
    "tpch_q20",
    (s, d) => {
      val t = Tables(s, d)
      val redParts = t.part.filter(col("p_name").like("red%"))
        .select(col("p_partkey").as("rp_partkey"))
      val shippedEnough = t.lineitem
        .filter(col("l_shipdate") >= "1997-01-01" &&
          col("l_shipdate") < "1998-01-01")
        .join(broadcast(redParts), col("l_partkey") === col("rp_partkey"),
          "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("ship_qty"))
        .filter(col("ship_qty") > 50)
        .select("l_suppkey")
      regionSuppliers(t, "EUROPE")
        .join(shippedEnough, col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .select("s_name", "s_acctbal")
    },
    Some(
      s"""SELECT s_name, s_acctbal
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'EUROPE' AND s_suppkey IN (
         |  SELECT l_suppkey FROM lineitem
         |  WHERE l_partkey IN
         |      (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
         |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  GROUP BY l_suppkey HAVING ${dsumSql("l_quantity")} > 50)""".stripMargin),
  )

  // --------------------------------------------------------------- Q21
  /** Q21 suppliers who kept orders waiting — ADAPTED: "received after
    * commit" becomes `l_shipdate > o_orderdate + 90 days` and the nation
    * filter is region-level. The defining shape — the EXISTS (another
    * supplier on the order) + NOT EXISTS (no OTHER supplier was also
    * late) semi/anti-join pair against the same lineitem — is intact.
    */
  private val q21 = Q(
    "tpch_q21",
    (s, d) => {
      val t = Tables(s, d)
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
      val l1 = regionSuppliers(t, "ASIA").select("s_suppkey", "s_name")
        .join(t.lineitem, col("s_suppkey") === col("l_suppkey"))
        .join(t.orders.filter(col("o_orderstatus") === "F"),
          col("o_orderkey") === col("l_orderkey"))
        .filter(late)
      val l2 = t.lineitem.select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
      val l3 = t.lineitem.select(col("l_orderkey").as("l3_orderkey"),
        col("l_suppkey").as("l3_suppkey"), col("l_shipdate").as("l3_shipdate"))
      l1
        .join(l2, col("l_orderkey") === col("l2_orderkey") &&
          col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
        .join(l3, col("l_orderkey") === col("l3_orderkey") &&
          col("l_suppkey") =!= col("l3_suppkey") &&
          col("l3_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_anti")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), asc("s_name"))
        .limit(100)
    },
    Some(
      """SELECT s_name, count(*) AS numwait
        |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderstatus = 'F' AND r_name = 'ASIA'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),
  )

  // --------------------------------------------------------------- Q22
  /** Q22 global sales opportunity — ADAPTED: the phone-prefix country
    * code becomes `c_nationkey % 5` (the generator's nation→region
    * residue) and "never ordered" becomes "no order since 2000" (every
    * sf0.001 customer has ≥1 order). The defining shape — a scalar AVG
    * subquery gate plus a NOT EXISTS anti join on orders — is intact.
    */
  private val q22 = Q(
    "tpch_q22",
    (s, d) => {
      val t = Tables(s, d)
      val code = (col("c_nationkey") % 5).as("cntrycode")
      val inCodes = (col("c_nationkey") % 5).isin(0, 1, 2, 3)
      val avgBal = t.customer
        .filter(col("c_acctbal") > 0 && inCodes)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      val recent = t.orders.filter(col("o_orderdate") >= "2000-01-01")
        .select(col("o_custkey").as("r_custkey"))
      t.customer.filter(inCodes)
        .join(broadcast(avgBal)).filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("r_custkey"), "left_anti")
        .groupBy(code)
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
    },
    Some(
      s"""SELECT cntrycode, count(*) AS numcust,
         |  ${dsumSql("c_acctbal")} AS totacctbal
         |FROM (
         |  SELECT c_nationkey % 5 AS cntrycode, c_acctbal
         |  FROM customer
         |  WHERE c_nationkey % 5 IN (0, 1, 2, 3)
         |    AND c_acctbal > (SELECT ${davgSql("c_acctbal")} FROM customer
         |      WHERE c_acctbal > 0 AND c_nationkey % 5 IN (0, 1, 2, 3))
         |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         |) custsale GROUP BY cntrycode""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22)
}
