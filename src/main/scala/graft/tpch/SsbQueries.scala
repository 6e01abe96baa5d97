package graft.tpch

import graft.{Q, Tables}
import graft.util.Stable.{dsum, dsumSql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star Schema Benchmark conformance block (O'Neil et al., public) —
  * the second external suite beside [[TpchQueries]], closing the
  * remaining "TPC-H/DS/SSB: not present" note from SURVEY §5 for the
  * suites this schema can express (TPC-DS needs its own schema and is
  * out of scope).
  *
  * SSB's denormalised `lineorder` fact is derived as
  * `lineitem ⋈ orders` on the order key; the date dimension's
  * year/month/week attributes come from `o_orderdate` directly (SSB's
  * date dim is a function of the date — deriving it loses nothing);
  * `p_category`-style rollups use the generator's 6-value `p_type`
  * domain and brand ranges. Q1 uses SSB's `extendedprice · discount`
  * revenue, Q2-Q4 the discounted-price form.
  *
  * Plan discipline: each flight is the canonical star shape — the fact
  * scan with its pushed filters, all dims broadcast, ONE aggregate
  * shuffle. The SsbPlanSpec pins that no flight shuffles more than the
  * final aggregate.
  */
object SsbQueries {

  private def fact(t: Tables): DataFrame =
    t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))

  private def revenue: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  private val revenueSql = "l_extendedprice * (1.0 - l_discount)"

  private val factSql = "lineitem JOIN orders ON l_orderkey = o_orderkey"

  // ---------------------------------------------------------- flight 1
  /** Q1.x — one-table revenue probes: pushed fact filters, single global
    * aggregate, zero hash shuffles.
    */
  private def q1(name: String, sparkFilter: DataFrame => DataFrame,
      sqlWhere: String) = Q(
    name,
    (s, d) =>
      sparkFilter(fact(Tables(s, d)))
        .agg(dsum(col("l_extendedprice") * col("l_discount"))
          .as("revenue")),
    Some(
      s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue
         |FROM $factSql
         |WHERE $sqlWhere""".stripMargin),
  )

  private val q11 = q1("ssb_q1_1",
    _.filter(year(col("o_orderdate")) === 1997 &&
      col("l_discount").between(0.01, 0.03) && col("l_quantity") < 25),
    """extract(year FROM o_orderdate) = 1997
      |  AND l_discount BETWEEN 0.01 AND 0.03 AND l_quantity < 25""".stripMargin)

  private val q12 = q1("ssb_q1_2",
    _.filter(year(col("o_orderdate")) === 1997 &&
      month(col("o_orderdate")) === 3 &&
      col("l_discount").between(0.04, 0.06) &&
      col("l_quantity").between(26, 35)),
    """extract(year FROM o_orderdate) = 1997
      |  AND extract(month FROM o_orderdate) = 3
      |  AND l_discount BETWEEN 0.04 AND 0.06
      |  AND l_quantity BETWEEN 26 AND 35""".stripMargin)

  private val q13 = q1("ssb_q1_3",
    // weekofyear is ISO week in both engines
    _.filter(weekofyear(col("o_orderdate")) === 6 &&
      year(col("o_orderdate")) === 1997 &&
      col("l_discount").between(0.05, 0.07) &&
      col("l_quantity").between(26, 35)),
    """extract(week FROM o_orderdate) = 6
      |  AND extract(year FROM o_orderdate) = 1997
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity BETWEEN 26 AND 35""".stripMargin)

  // ---------------------------------------------------------- flight 2
  /** Q2.x — part × supplier-region stars: (year, brand) revenue. */
  private def q2(name: String, partFilter: Column, partFilterSql: String,
      rName: String) = Q(
    name,
    (s, d) => {
      val t = Tables(s, d)
      fact(t)
        .join(broadcast(t.part.filter(partFilter)),
          col("l_partkey") === col("p_partkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === rName)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).as("d_year"), col("p_brand"))
        .agg(dsum(revenue).as("revenue"))
        .select("revenue", "d_year", "p_brand")
    },
    Some(
      s"""SELECT ${dsumSql(revenueSql)} AS revenue,
         |  extract(year FROM o_orderdate) AS d_year, p_brand
         |FROM $factSql
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE $partFilterSql AND r_name = '$rName'
         |GROUP BY extract(year FROM o_orderdate), p_brand""".stripMargin),
  )

  private val q21 = q2("ssb_q2_1", col("p_type") === "MEDIUM",
    "p_type = 'MEDIUM'", "AMERICA")
  private val q22 = q2("ssb_q2_2",
    col("p_brand").between("Brand#21", "Brand#24"),
    "p_brand BETWEEN 'Brand#21' AND 'Brand#24'", "ASIA")
  private val q23 = q2("ssb_q2_3", col("p_brand") === "Brand#14",
    "p_brand = 'Brand#14'", "EUROPE")

  // ---------------------------------------------------------- flight 3
  /** Q3.x — customer-nation × supplier-nation revenue over a date
    * window, at region / region-key / nation-set / month granularity.
    */
  private def q3(name: String, custCond: Column, suppCond: Column,
      dateCond: Column, whereSql: String) = Q(
    name,
    (s, d) => {
      val t = Tables(s, d)
      val cn = broadcast(t.nation
        .join(broadcast(t.region.select(col("r_regionkey").as("cr_key"),
          col("r_name").as("cr_name"))), col("n_regionkey") === col("cr_key"))
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("c_nation"),
          col("n_regionkey").as("cn_rkey"), col("cr_name")))
      val sn = broadcast(t.nation
        .join(broadcast(t.region.select(col("r_regionkey").as("sr_key"),
          col("r_name").as("sr_name"))), col("n_regionkey") === col("sr_key"))
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("s_nation"),
          col("n_regionkey").as("sn_rkey"), col("sr_name")))
      fact(t).filter(dateCond)
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(cn, col("c_nationkey") === col("cn_key"))
        .join(sn, col("s_nationkey") === col("sn_key"))
        .filter(custCond && suppCond)
        .groupBy(col("c_nation"), col("s_nation"),
          year(col("o_orderdate")).as("d_year"))
        .agg(dsum(revenue).as("revenue"))
    },
    Some(
      s"""SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
         |  extract(year FROM o_orderdate) AS d_year,
         |  ${dsumSql(revenueSql)} AS revenue
         |FROM $factSql
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
         |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
         |WHERE $whereSql
         |GROUP BY cn.n_name, sn.n_name,
         |  extract(year FROM o_orderdate)""".stripMargin),
  )

  private def yearBetween(lo: Int, hi: Int): Column =
    year(col("o_orderdate")).between(lo, hi)

  private val q31 = q3("ssb_q3_1",
    col("cr_name") === "ASIA", col("sr_name") === "ASIA",
    yearBetween(1996, 1999),
    """cr.r_name = 'ASIA' AND sr.r_name = 'ASIA'
      |  AND extract(year FROM o_orderdate) BETWEEN 1996 AND 1999""".stripMargin)

  private val q32 = q3("ssb_q3_2",
    col("cn_rkey") === 3, col("sn_rkey") === 3,
    yearBetween(1996, 1999),
    """cn.n_regionkey = 3 AND sn.n_regionkey = 3
      |  AND extract(year FROM o_orderdate) BETWEEN 1996 AND 1999""".stripMargin)

  private val q33 = q3("ssb_q3_3",
    col("c_nation").isin("NATION_3", "NATION_8"),
    col("s_nation").isin("NATION_3", "NATION_8"),
    yearBetween(1996, 1999),
    """cn.n_name IN ('NATION_3', 'NATION_8')
      |  AND sn.n_name IN ('NATION_3', 'NATION_8')
      |  AND extract(year FROM o_orderdate) BETWEEN 1996 AND 1999""".stripMargin)

  private val q34 = q3("ssb_q3_4",
    col("c_nation").isin("NATION_3", "NATION_8"),
    col("s_nation").isin("NATION_3", "NATION_8"),
    year(col("o_orderdate")) === 1997 && month(col("o_orderdate")) === 12,
    """cn.n_name IN ('NATION_3', 'NATION_8')
      |  AND sn.n_name IN ('NATION_3', 'NATION_8')
      |  AND extract(year FROM o_orderdate) = 1997
      |  AND extract(month FROM o_orderdate) = 12""".stripMargin)

  // ---------------------------------------------------------- flight 4
  /** Q4.x — the profit drill-down (SSB's supplycost term is absent from
    * this schema, as in [[TpchQueries]] Q9; profit reduces to discounted
    * revenue). 4.1 by customer nation, 4.2 adds the year cut and type,
    * 4.3 narrows to one type at brand grain.
    */
  private val q41 = Q(
    "ssb_q4_1",
    (s, d) => {
      val t = Tables(s, d)
      val cn = broadcast(t.nation.select(col("n_nationkey").as("cn_key"),
        col("n_name").as("c_nation"), col("n_regionkey").as("cn_rkey")))
      val sn = broadcast(t.nation.select(col("n_nationkey").as("sn_key"),
        col("n_regionkey").as("sn_rkey")))
      val amer = broadcast(t.region.filter(col("r_name") === "AMERICA"))
      fact(t)
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.part.filter(
          col("p_type").isin("ECONOMY", "PROMO"))),
          col("l_partkey") === col("p_partkey"))
        .join(cn, col("c_nationkey") === col("cn_key"))
        .join(sn, col("s_nationkey") === col("sn_key"))
        .join(amer.select(col("r_regionkey").as("cr_key")),
          col("cn_rkey") === col("cr_key"))
        .join(amer.select(col("r_regionkey").as("sr_key")),
          col("sn_rkey") === col("sr_key"))
        .groupBy(year(col("o_orderdate")).as("d_year"), col("c_nation"))
        .agg(dsum(revenue).as("profit"))
    },
    Some(
      s"""SELECT extract(year FROM o_orderdate) AS d_year,
         |  cn.n_name AS c_nation, ${dsumSql(revenueSql)} AS profit
         |FROM $factSql
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
         |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
         |WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
         |  AND p_type IN ('ECONOMY', 'PROMO')
         |GROUP BY extract(year FROM o_orderdate), cn.n_name""".stripMargin),
  )

  private val q42 = Q(
    "ssb_q4_2",
    (s, d) => {
      val t = Tables(s, d)
      val cn = broadcast(t.nation.select(col("n_nationkey").as("cn_key"),
        col("n_regionkey").as("cn_rkey")))
      val sn = broadcast(t.nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("s_nation"), col("n_regionkey").as("sn_rkey")))
      val amer = broadcast(t.region.filter(col("r_name") === "AMERICA"))
      fact(t).filter(year(col("o_orderdate")).isin(1997, 1998))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.part.filter(
          col("p_type").isin("ECONOMY", "PROMO"))),
          col("l_partkey") === col("p_partkey"))
        .join(cn, col("c_nationkey") === col("cn_key"))
        .join(sn, col("s_nationkey") === col("sn_key"))
        .join(amer.select(col("r_regionkey").as("cr_key")),
          col("cn_rkey") === col("cr_key"))
        .join(amer.select(col("r_regionkey").as("sr_key")),
          col("sn_rkey") === col("sr_key"))
        .groupBy(year(col("o_orderdate")).as("d_year"), col("s_nation"),
          col("p_type"))
        .agg(dsum(revenue).as("profit"))
    },
    Some(
      s"""SELECT extract(year FROM o_orderdate) AS d_year,
         |  sn.n_name AS s_nation, p_type,
         |  ${dsumSql(revenueSql)} AS profit
         |FROM $factSql
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
         |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
         |WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
         |  AND extract(year FROM o_orderdate) IN (1997, 1998)
         |  AND p_type IN ('ECONOMY', 'PROMO')
         |GROUP BY extract(year FROM o_orderdate), sn.n_name,
         |  p_type""".stripMargin),
  )

  private val q43 = Q(
    "ssb_q4_3",
    (s, d) => {
      val t = Tables(s, d)
      fact(t).filter(year(col("o_orderdate")).isin(1997, 1998))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.part.filter(col("p_type") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t.nation.select(col("n_nationkey").as("sn_key"),
          col("n_name").as("s_nation"), col("n_regionkey").as("sn_rkey"))),
          col("s_nationkey") === col("sn_key"))
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("sn_rkey") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).as("d_year"), col("s_nation"),
          col("p_brand"))
        .agg(dsum(revenue).as("profit"))
    },
    Some(
      s"""SELECT extract(year FROM o_orderdate) AS d_year,
         |  sn.n_name AS s_nation, p_brand,
         |  ${dsumSql(revenueSql)} AS profit
         |FROM $factSql
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
         |WHERE sr.r_name = 'ASIA'
         |  AND extract(year FROM o_orderdate) IN (1997, 1998)
         |  AND p_type = 'ECONOMY'
         |GROUP BY extract(year FROM o_orderdate), sn.n_name,
         |  p_brand""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q11, q12, q13, q21, q22, q23,
    q31, q32, q33, q34, q41, q42, q43)
}
