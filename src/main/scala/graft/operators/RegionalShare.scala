package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regional labour-market share statistics — the three classic
  * decompositions a jobs observatory publishes per region (the
  * reference's aggregate stage emits exactly this kind of indicator,
  * `flows/aggregate/common.py:139-195`): location quotient (regional
  * specialisation), Herfindahl–Hirschman concentration (market
  * concentration), and shift–share (growth decomposed into national /
  * industry-mix / regional-competitive components).
  *
  * The job-ad analog on the TPC-H tables: a lineitem is a "posting",
  * its supplier nation the region, and the first token of its part's
  * type (STANDARD/SMALL/MEDIUM/LARGE/ECONOMY/PROMO) the industry. All three are one hash aggregate over the fact table
  * (map-side combinable) followed by window sums over the tiny
  * region×industry cube — at 100 TB the windows see |regions|·
  * |industries| rows, never the data.
  *
  * Exactness: ratios are ppm BIGINTs via floor division over
  * NON-NEGATIVE operands only (Spark `div` truncates toward zero,
  * DuckDB `//` floors; they agree only when nothing is negative —
  * see [[WindowedHll]]). Shift-share keeps growth as a ppm RATIO
  * (1e6·e1 div e0 ≥ 0) and subtracts ratios after dividing, so no
  * negative value ever reaches a `div`. Products are bounded by
  * 1e6·c·N ≤ 9.2e18 up to ~sf5; beyond that the ppm scale drops a
  * digit (same documented bound as the gini/zipf rows).
  */
object RegionalShare {

  val Ppm = 1000000L

  /** postings per (region, industry) with region/industry labels
    * (shared with [[Raking]]).
    */
  private[operators] def cells(t: Tables): DataFrame = {
    val sup = t.supplier.select(col("s_suppkey"), col("s_nationkey"))
    val nat = t.nation.select(col("n_nationkey"), col("n_name"))
    val prt = t.part.select(col("p_partkey"),
      split(col("p_type"), " ").getItem(0).as("industry"))
    t.lineitem.select(col("l_suppkey"), col("l_partkey"), col("l_shipdate"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("region"), col("industry"),
        col("l_shipdate"))
  }

  private val cellsSql =
    """SELECT n_name AS region,
      |    str_split(p_type, ' ')[1] AS industry, l_shipdate
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN nation ON s_nationkey = n_nationkey""".stripMargin

  /** LQ(r,i) = (c_ri / c_r) / (c_i / c_total), published in ppm:
    * lq_ppm = 1e6·c_ri·c_total div (c_r·c_i). LQ > 1e6 reads "region r
    * is specialised in industry i relative to the nation".
    */
  private val lq = Q(
    "a56_location_quotient",
    (s, d) => {
      val c = cells(Tables(s, d))
        .groupBy("region", "industry").agg(count(lit(1)).as("n_jobs"))
      val wR = Window.partitionBy("region")
      val wI = Window.partitionBy("industry")
      val wAll = Window.partitionBy(lit(1))
      c.select(col("region"), col("industry"), col("n_jobs"),
        (lit(Ppm) * col("n_jobs") * sum(col("n_jobs")).over(wAll))
          .as("num"),
        (sum(col("n_jobs")).over(wR) * sum(col("n_jobs")).over(wI))
          .as("den"))
        .select(col("region"), col("industry"), col("n_jobs"),
          expr("num div den").as("lq_ppm"))
    },
    Some(
      s"""WITH cells AS ($cellsSql),
         |c AS (
         |  SELECT region, industry, count(*) AS n_jobs
         |  FROM cells GROUP BY 1, 2)
         |SELECT region, industry, n_jobs,
         |  CAST((($Ppm * n_jobs) * sum(n_jobs) OVER ())
         |    // (sum(n_jobs) OVER (PARTITION BY region)
         |        * sum(n_jobs) OVER (PARTITION BY industry))
         |    AS BIGINT) AS lq_ppm
         |FROM c""".stripMargin),
  )

  /** HHI per industry market over seller (supplier-nation = region)
    * shares: hhi_ppm = 1e6·Σ c_r² div (Σ c_r)² ∈ (0, 1e6]; 1e6/n for
    * n equal sellers, 1e6 for a monopoly.
    */
  private val hhi = Q(
    "a57_hhi_concentration",
    (s, d) => {
      val c = cells(Tables(s, d))
        .groupBy("industry", "region").agg(count(lit(1)).as("n"))
      c.groupBy("industry")
        .agg(count(lit(1)).as("n_sellers"), sum(col("n")).as("n_jobs"),
          sum(col("n") * col("n")).as("sum_sq"))
        .select(col("industry"), col("n_sellers"), col("n_jobs"),
          expr(s"($Ppm * sum_sq) div (n_jobs * n_jobs)").as("hhi_ppm"))
    },
    Some(
      s"""WITH cells AS ($cellsSql),
         |c AS (
         |  SELECT industry, region, count(*) AS n
         |  FROM cells GROUP BY 1, 2)
         |SELECT industry, count(*) AS n_sellers,
         |  CAST(sum(n) AS BIGINT) AS n_jobs,
         |  ($Ppm * CAST(sum(n * n) AS BIGINT))
         |    // (CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT))
         |    AS hhi_ppm
         |FROM c GROUP BY 1""".stripMargin),
  )

  val Y0 = 1997
  val Y1 = 1998

  /** Shift–share: per region, the employment change decomposed as
    * NS (what national growth alone would add) + IM (industry-mix:
    * being in fast/slow industries) + RS (regional competitiveness:
    * out/under-performing the industry). Growth stays a non-negative
    * ppm ratio (1e6·e1 div e0); components subtract ratios AFTER the
    * division, in e0-weighted micro-job units:
    *   ns = Σ_i e0_ri·(R_nat − 1e6), im = Σ_i e0_ri·(R_i − R_nat),
    *   rs = Σ_i e0_ri·(R_ri − R_i), d_units = (e1_r − e0_r)·1e6.
    * Cells that appear only in Y1 contribute to e1 (and therefore to
    * the actual change) but not to RS — the standard base-period
    * caveat of the method.
    */
  private val shiftShare = Q(
    "a58_shift_share",
    (s, d) => {
      val c = cells(Tables(s, d))
        .withColumn("y", year(col("l_shipdate")))
        .filter(col("y").isin(Y0, Y1))
        .groupBy("region", "industry")
        .agg(sum(when(col("y") === Y0, 1L).otherwise(0L)).as("e0"),
          sum(when(col("y") === Y1, 1L).otherwise(0L)).as("e1"))
        .filter(col("e0") > 0)
      val wI = Window.partitionBy("industry")
      val wAll = Window.partitionBy(lit(1))
      val rated = c.select(col("region"), col("e0"), col("e1"),
          sum(col("e1")).over(wI).as("ie1"),
          sum(col("e0")).over(wI).as("ie0"),
          sum(col("e1")).over(wAll).as("te1"),
          sum(col("e0")).over(wAll).as("te0"))
        .select(col("region"), col("e0"), col("e1"),
          expr(s"($Ppm * e1) div e0").as("r_cell"),
          expr(s"($Ppm * ie1) div ie0").as("r_ind"),
          expr(s"($Ppm * te1) div te0").as("r_nat"))
      rated.groupBy("region")
        .agg(sum(col("e0")).as("e0"), sum(col("e1")).as("e1"),
          sum(col("e0") * (col("r_nat") - lit(Ppm))).as("ns_units"),
          sum(col("e0") * (col("r_ind") - col("r_nat"))).as("im_units"),
          sum(col("e0") * (col("r_cell") - col("r_ind"))).as("rs_units"))
        .select(col("region"), col("e0"), col("e1"),
          ((col("e1") - col("e0")) * lit(Ppm)).as("d_units"),
          col("ns_units"), col("im_units"), col("rs_units"))
    },
    Some(
      s"""WITH cells AS ($cellsSql),
         |c AS (
         |  SELECT region, industry,
         |    CAST(sum(CASE WHEN EXTRACT(year FROM l_shipdate) = $Y0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS e0,
         |    CAST(sum(CASE WHEN EXTRACT(year FROM l_shipdate) = $Y1
         |      THEN 1 ELSE 0 END) AS BIGINT) AS e1
         |  FROM cells
         |  WHERE EXTRACT(year FROM l_shipdate) IN ($Y0, $Y1)
         |  GROUP BY 1, 2),
         |kept AS (SELECT * FROM c WHERE e0 > 0),
         |rated AS (
         |  SELECT region, e0, e1,
         |    ($Ppm * e1) // e0 AS r_cell,
         |    ($Ppm * sum(e1) OVER (PARTITION BY industry))
         |      // sum(e0) OVER (PARTITION BY industry) AS r_ind,
         |    ($Ppm * sum(e1) OVER ()) // sum(e0) OVER () AS r_nat
         |  FROM kept)
         |SELECT region, CAST(sum(e0) AS BIGINT) AS e0,
         |  CAST(sum(e1) AS BIGINT) AS e1,
         |  CAST((sum(e1) - sum(e0)) * $Ppm AS BIGINT) AS d_units,
         |  CAST(sum(e0 * (r_nat - $Ppm)) AS BIGINT) AS ns_units,
         |  CAST(sum(e0 * (r_ind - r_nat)) AS BIGINT) AS im_units,
         |  CAST(sum(e0 * (r_cell - r_ind)) AS BIGINT) AS rs_units
         |FROM rated GROUP BY 1""".stripMargin),
  )

  def all: Seq[Q] = Seq(lq, hhi, shiftShare)
}
