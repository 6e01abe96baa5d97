package graft.operators

import graft.{Q, Tables}
import graft.util.Stable._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.2–§2.5), re-expressed
  * Spark-first over the TPC-H-ish test tables.
  *
  * Design notes for the 100 TB posture:
  *  - every filter/projection is declared on the scan-side DataFrame so
  *    Catalyst pushes it into the parquet reader (PushedFilters/ReadSchema);
  *  - dimension joins (`region`, `nation`, `supplier`) are explicitly
  *    `broadcast()` — no shuffle of the fact table for small dims;
  *  - top-N uses `orderBy.limit` (TakeOrderedAndProject: per-partition
  *    heaps + single driver merge, never a full sort);
  *  - float aggregates go through [[graft.util.Stable]] so the result is
  *    order-independent under any degree of partial aggregation.
  */
object Relational {

  // ---- projections / filters (P1–P10; ref dqa/data_getters.py:248-250,
  //      flows/enrich/common.py:20-38, flows/aggregate/*_snapshot.py) ----

  private val p1 = Q(
    "p1_project_prune",
    (s, d) =>
      Tables(s, d).lineitem
        .select("l_orderkey", "l_linenumber", "l_extendedprice"),
    Some("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem"),
  )

  private val p3 = Q(
    "p3_text_length_filter",
    (s, d) =>
      Tables(s, d).documents
        .filter(length(col("text")) > 300)
        .select("doc_id", "lang", "n_chars"),
    Some(
      "SELECT doc_id, lang, n_chars FROM documents WHERE length(text) > 300"),
  )

  private val p4 = Q(
    "p4_date_range_filter",
    (s, d) =>
      Tables(s, d).lineitem
        .filter(col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .select("l_orderkey", "l_linenumber", "l_shipdate"),
    Some(
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |  AND TIMESTAMP '1996-12-31 00:00:00'""".stripMargin),
  )

  private val p5 = Q(
    "p5_isin_membership",
    (s, d) =>
      Tables(s, d).lineitem
        .filter(col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag"),
    Some(
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_returnflag IN ('A','R')""".stripMargin),
  )

  private val p8 = Q(
    "p8_topn_membership",
    (s, d) => {
      val t = Tables(s, d)
      // top-5 customers by order count (deterministic tiebreak on key),
      // then keep only their orders via a broadcast semi join — the fact
      // table never shuffles.
      val top = t.orders
        .groupBy("o_custkey").count()
        .orderBy(desc("count"), asc("o_custkey"))
        .limit(5)
      t.orders
        .join(broadcast(top.select("o_custkey")), Seq("o_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },
    Some(
      """WITH top5 AS (
        |  SELECT o_custkey FROM orders GROUP BY o_custkey
        |  ORDER BY count(*) DESC, o_custkey ASC LIMIT 5)
        |SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT o_custkey FROM top5)""".stripMargin),
  )

  private val p9 = Q(
    "p9_value_band_filter",
    (s, d) =>
      Tables(s, d).events
        .filter(col("value").between(10.0, 20.0))
        .select("event_id", "event_type", "value"),
    Some(
      """SELECT event_id, event_type, value FROM events
        |WHERE value BETWEEN 10.0 AND 20.0""".stripMargin),
  )

  private val p10 = Q(
    "p10_multi_predicate_filter",
    (s, d) =>
      Tables(s, d).events
        .filter(col("event_type") === "purchase" && col("value") > 50.0)
        .select("event_id", "user_id", "value"),
    Some(
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 50.0""".stripMargin),
  )

  // ---- joins (J1–J7; ref dqa/data_getters.py:419-506,638-663) ----

  private val j1 = Q(
    "j1_inner_equi_join",
    (s, d) => {
      val t = Tables(s, d)
      val o96 = t.orders
        .filter(col("o_orderdate").between("1996-01-01", "1996-12-31"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      t.lineitem
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .join(o96, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "o_orderstatus")
    },
    Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |  AND TIMESTAMP '1996-12-31 00:00:00'""".stripMargin),
  )

  private val j2 = Q(
    "j2_left_outer_join",
    (s, d) => {
      val t = Tables(s, d)
      t.customer
        .select("c_custkey", "c_mktsegment")
        .join(t.orders.select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(count(col("o_orderkey")).as("n_orders"))
    },
    Some(
      """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment""".stripMargin),
  )

  private val j3 = Q(
    "j3_broadcast_dim_join",
    (s, d) => {
      val t = Tables(s, d)
      // classic star join: fact ⋈ broadcast dims, one shuffle (the agg)
      t.lineitem.select("l_suppkey", "l_extendedprice", "l_discount")
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation.select("n_nationkey", "n_regionkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    },
    Some(
      s"""SELECT r_name, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin),
  )

  private val j6 = Q(
    "j6_feature_assembly",
    (s, d) => {
      val t = Tables(s, d)
      // the reference assembles per-id feature dicts in driver memory
      // (dqa/data_getters.py:638-663); here it is a multi-way left join of
      // pre-aggregated features — fully distributed, no driver state.
      val liFeat = t.lineitem
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      val cust = t.customer.select(col("c_custkey"), col("c_mktsegment"))
      t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .join(liFeat, Seq("o_orderkey"), "left")
        .join(cust, col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("n_items"), lit(0L)).as("n_items"),
          coalesce(col("sum_qty"), lit(0.0)).as("sum_qty"),
          col("c_mktsegment"))
    },
    Some(
      s"""WITH f AS (
         |  SELECT l_orderkey AS o_orderkey, count(*) AS n_items,
         |         ${dsumSql("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY 1)
         |SELECT o.o_orderkey, COALESCE(f.n_items, 0) AS n_items,
         |       COALESCE(f.sum_qty, 0.0) AS sum_qty, c.c_mktsegment
         |FROM orders o
         |LEFT JOIN f ON o.o_orderkey = f.o_orderkey
         |LEFT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin),
  )

  private val j7 = Q(
    "j7_anti_join",
    (s, d) => {
      val t = Tables(s, d)
      // customers with no orders in 1995 — the dedup-aware snapshot
      // anti-join shape (ref dqa/data_getters.py:233-245)
      t.customer.select("c_custkey", "c_name")
        .join(
          t.orders
            .filter(col("o_orderdate").between("1995-01-01", "1995-12-31"))
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
    },
    Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |    AND TIMESTAMP '1995-12-31 00:00:00')""".stripMargin),
  )

  private val jSemi = Q(
    "j10_semi_join",
    (s, d) => {
      val t = Tables(s, d)
      t.supplier.select("s_suppkey", "s_name")
        .join(
          t.lineitem
            .filter(col("l_shipdate") >= "2000-01-01")
            .select(col("l_suppkey").as("s_suppkey")),
          Seq("s_suppkey"), "left_semi")
    },
    Some(
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00')""".stripMargin),
  )

  // ---- aggregations (A1–A13; ref flows/aggregate/*) ----

  private val a1 = Q(
    "a1_count_by_key",
    (s, d) =>
      Tables(s, d).orders.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n")),
    Some("SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1"),
  )

  private val a2 = Q(
    "a2_global_minmax",
    (s, d) =>
      Tables(s, d).orders.agg(
        min(col("o_orderdate")).as("min_date"),
        max(col("o_orderdate")).as("max_date"),
        count(lit(1)).as("n")),
    Some(
      """SELECT min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
        |count(*) AS n FROM orders""".stripMargin),
  )

  private val a3 = Q(
    "a3_multikey_agg",
    (s, d) =>
      // TPC-H Q1 shape — the reference's sort_and_groupby workhorse
      // (flows/aggregate/common.py:198-204) as a single hash aggregate.
      Tables(s, d).lineitem
        .filter(col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order")),
    Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin),
  )

  private val a4 = Q(
    "a4_exact_quantiles",
    (s, d) =>
      // exact percentiles (np.percentile parity — SURVEY §2.4 A4): built-in
      // `percentile`, NOT percentile_approx, so the oracle hash matches.
      Tables(s, d).lineitem.groupBy("l_returnflag")
        .agg(
          percentile(col("l_quantity"), lit(0.25)).as("q25"),
          percentile(col("l_quantity"), lit(0.5)).as("q50"),
          percentile(col("l_quantity"), lit(0.75)).as("q75")),
    Some(
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.50) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),
  )

  private val a5 = Q(
    "a5_topn_most_common",
    (s, d) =>
      // TakeOrderedAndProject: no global sort at scale
      Tables(s, d).lineitem.groupBy("l_partkey").count()
        .orderBy(desc("count"), asc("l_partkey"))
        .limit(10),
    Some(
      """SELECT l_partkey, count(*) AS count FROM lineitem GROUP BY 1
        |ORDER BY count DESC, l_partkey ASC LIMIT 10""".stripMargin),
  )

  private val a6 = Q(
    "a6_pct_within_group",
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
      Tables(s, d).orders
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .withColumn("pct", col("n") * 100.0 / sum(col("n")).over(w))
    },
    Some(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  count(*) * 100.0 / sum(count(*)) OVER (PARTITION BY o_orderpriority) AS pct
        |FROM orders GROUP BY 1, 2""".stripMargin),
  )

  private val a7 = Q(
    "a7_index_normalisation",
    (s, d) => {
      // stock-index pattern (flows/aggregate/common.py:207-232): weekly
      // counts normalised by a fixed baseline window, baseline broadcast.
      val weekly = Tables(s, d).orders
        .groupBy(date_trunc("week", col("o_orderdate")).cast("date").as("ws"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val base = weekly
        .filter(col("ws").between("1995-01-02", "1995-01-23"))
        .groupBy("o_orderpriority")
        .agg((sum(col("n")).cast("double") / count(lit(1))).as("baseline"))
      weekly.join(broadcast(base), Seq("o_orderpriority"))
        .select(col("ws"), col("o_orderpriority"), col("n"),
          (col("n") / col("baseline")).as("idx"))
    },
    Some(
      """WITH weekly AS (
        |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS ws,
        |         o_orderpriority, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |base AS (
        |  SELECT o_orderpriority,
        |         CAST(sum(n) AS DOUBLE) / count(*) AS baseline
        |  FROM weekly WHERE ws BETWEEN DATE '1995-01-02' AND DATE '1995-01-23'
        |  GROUP BY 1)
        |SELECT w.ws, w.o_orderpriority, w.n, w.n / b.baseline AS idx
        |FROM weekly w JOIN base b ON w.o_orderpriority = b.o_orderpriority""".stripMargin),
  )

  private val a9 = Q(
    "a9_first_row_per_key",
    (s, d) => {
      // deterministic "one row per entity" (ref dqa/data_getters.py:527-544
      // relies on MySQL's arbitrary pick; we make it a total order)
      val w = Window.partitionBy("o_custkey")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      Tables(s, d).orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    },
    Some(
      """SELECT o_custkey, o_orderkey, o_orderdate FROM orders
        |QUALIFY row_number() OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) = 1""".stripMargin),
  )

  private val a10 = Q(
    "a10_distinct",
    (s, d) =>
      Tables(s, d).lineitem
        .filter(col("l_shipdate") >= "2001-01-01")
        .select("l_orderkey", "l_suppkey")
        .distinct(),
    Some(
      """SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'""".stripMargin),
  )

  private val a11 = Q(
    "a11_cumulative_counts",
    (s, d) => {
      val monthly = Tables(s, d).orders
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mo"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("o_orderpriority").orderBy("mo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly.withColumn("cum_n", sum(col("n")).over(w))
    },
    Some(
      """WITH monthly AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
        |         o_orderpriority, count(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT mo, o_orderpriority, n,
        |  CAST(sum(n) OVER (PARTITION BY o_orderpriority ORDER BY mo
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
        |FROM monthly""".stripMargin),
  )

  private val a12 = Q(
    "a12_explode_word_count",
    (s, d) =>
      Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n")),
    Some(
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word""".stripMargin),
  )

  private val a13 = Q(
    "a13_stats_per_day",
    (s, d) =>
      Tables(s, d).events
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value")),
    Some(
      s"""SELECT CAST(ts AS DATE) AS day, count(*) AS n,
         |  ${dsumSql("value")} AS sum_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events GROUP BY 1""".stripMargin),
  )

  // ---- sorts / limits / set ops (W4, W5, O1–O3) ----

  private val w4 = Q(
    "w4_rank_within_group",
    (s, d) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(desc("p_retailprice"), asc("p_partkey"))
      Tables(s, d).part
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    },
    Some(
      """SELECT p_brand, p_partkey, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand
        |    ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        |FROM part
        |QUALIFY rn <= 3""".stripMargin),
  )

  private val w5 = Q(
    "w5_ordered_limit",
    (s, d) =>
      Tables(s, d).lineitem
        .orderBy(asc("l_orderkey"), asc("l_linenumber"))
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_quantity"),
    Some(
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey ASC, l_linenumber ASC LIMIT 100""".stripMargin),
  )

  private val o1 = Q(
    "o1_union",
    (s, d) => {
      val t = Tables(s, d)
      val c = t.customer.select(col("c_name").as("name"),
        lit("customer").as("kind"))
      val sup = t.supplier.select(col("s_name").as("name"),
        lit("supplier").as("kind"))
      c.unionByName(sup)
    },
    Some(
      """SELECT c_name AS name, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_name AS name, 'supplier' AS kind FROM supplier""".stripMargin),
  )

  private val o2 = Q(
    "o2_except",
    (s, d) => {
      val t = Tables(s, d)
      t.customer.select(col("c_nationkey").as("nk"))
        .except(t.supplier.select(col("s_nationkey").as("nk")))
    },
    Some(
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin),
  )

  private val o3 = Q(
    "o3_intersect",
    (s, d) => {
      val t = Tables(s, d)
      t.customer.select(col("c_nationkey").as("nk"))
        .intersect(t.supplier.select(col("s_nationkey").as("nk")))
    },
    Some(
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin),
  )

  def all: Seq[Q] = Seq(
    p1, p3, p4, p5, p8, p9, p10,
    j1, j2, j3, j6, j7, jSemi,
    a1, a2, a3, a4, a5, a6, a7, a9, a10, a11, a12, a13,
    w4, w5, o1, o2, o3,
  )
}
