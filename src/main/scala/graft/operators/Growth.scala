package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar-aligned growth rates — the MoM / YoY deltas every published
  * KPI series carries. Month-over-month compares adjacent calendar
  * months; year-over-year compares the SAME month one year back (lag 12
  * over a gap-free month spine), which is the seasonally-honest
  * comparison `e_stl_decompose` would otherwise have to supply. Growth
  * is exact ppm integer division over integer counts; revenue goes
  * through the decimal-stable sum first. The month spine is derived
  * from the data (no calendar table needed) and the window frames are
  * per-series — series count bounds the shuffle, never row count.
  */
object Growth {

  private val growth = Q(
    "w17_mom_yoy_growth",
    (s, d) => {
      val monthly = Tables(s, d).orders
        .groupBy(col("o_orderpriority").as("series"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("mnum"))
        .agg(count(lit(1)).as("n"),
          Stable.dsum(col("o_totalprice")).as("revenue"))
      val w = Window.partitionBy("series").orderBy("mnum")
      monthly
        .withColumn("n_prev", lag(col("n"), 1).over(w))
        .withColumn("mnum_prev", lag(col("mnum"), 1).over(w))
        .withColumn("n_yoy", lag(col("n"), 12).over(w))
        .withColumn("mnum_yoy", lag(col("mnum"), 12).over(w))
        .select(col("series"),
          (col("mnum") / 12).cast("long").as("year"),
          pmod(col("mnum"), lit(12)).cast("long").as("month0"),
          col("n"), col("revenue"),
          // guard BOTH existence and calendar adjacency: a gap month
          // must yield NULL, not a misaligned comparison
          when(col("mnum_prev") === col("mnum") - 1,
            expr("1000000 * (n - n_prev) div n_prev")).as("mom_growth_ppm"),
          when(col("mnum_yoy") === col("mnum") - 12,
            expr("1000000 * (n - n_yoy) div n_yoy")).as("yoy_growth_ppm"))
    },
    Some(
      s"""WITH m AS (
         |  SELECT o_orderpriority AS series,
         |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
         |      AS BIGINT) AS mnum,
         |    count(*) AS n,
         |    ${Stable.dsumSql("o_totalprice")} AS revenue
         |  FROM orders GROUP BY 1, 2),
         |lagged AS (
         |  SELECT series, mnum, n, revenue,
         |    lag(n, 1) OVER w AS n_prev, lag(mnum, 1) OVER w AS mnum_prev,
         |    lag(n, 12) OVER w AS n_yoy, lag(mnum, 12) OVER w AS mnum_yoy
         |  FROM m WINDOW w AS (PARTITION BY series ORDER BY mnum))
         |SELECT series, mnum // 12 AS year, mnum % 12 AS month0,
         |  n, revenue,
         |  CASE WHEN mnum_prev = mnum - 1
         |       THEN 1000000 * (n - n_prev) // n_prev END
         |    AS mom_growth_ppm,
         |  CASE WHEN mnum_yoy = mnum - 12
         |       THEN 1000000 * (n - n_yoy) // n_yoy END
         |    AS yoy_growth_ppm
         |FROM lagged""".stripMargin),
  )

  /** Pearson chi-square independence statistic over a two-way
    * contingency table (priority × status) — "are these columns
    * actually independent?", the audit behind `a32_association_lift`'s
    * per-pair scores. Expected counts are exact rationals
    * (rowTot·colTot/N); each cell's (obs−exp)²/exp term is one fixed
    * IEEE chain and the CROSS-CELL sum goes through the decimal-stable
    * path (cell order is partition-dependent — a raw double sum here is
    * the classic nondeterminism). The statistic + dof are emitted; the
    * p-value lookup is a client-side table, not engine arithmetic.
    */
  private val chisq = Q(
    "a42_chisq_independence",
    (s, d) => {
      val o = Tables(s, d).orders
      val cells = o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("obs"))
      val rows = cells.groupBy("o_orderpriority")
        .agg(sum(col("obs")).as("rtot"))
      val cols = cells.groupBy("o_orderstatus")
        .agg(sum(col("obs")).as("ctot"))
      val n = cells.agg(sum(col("obs")).as("total"))
      val term = (col("obs").cast("double") -
        (col("rtot") * col("ctot")).cast("double") /
          col("total").cast("double")) // obs − exp
      cells
        .join(broadcast(rows), "o_orderpriority")
        .join(broadcast(cols), "o_orderstatus")
        .crossJoin(broadcast(n))
        .select(col("o_orderpriority"), col("o_orderstatus"), col("obs"),
          col("rtot"), col("ctot"), col("total"),
          (term * term /
            ((col("rtot") * col("ctot")).cast("double") /
              col("total").cast("double"))).as("cell"))
        .agg(
          Stable.dsum(col("cell"), 9).as("chi_sq"),
          ((countDistinct(col("o_orderpriority")) - 1) *
            (countDistinct(col("o_orderstatus")) - 1)).as("dof"))
    },
    Some(
      s"""WITH cells AS (
         |  SELECT o_orderpriority, o_orderstatus, count(*) AS obs
         |  FROM orders GROUP BY 1, 2),
         |r AS (SELECT o_orderpriority, CAST(sum(obs) AS BIGINT) AS rtot
         |      FROM cells GROUP BY 1),
         |c AS (SELECT o_orderstatus, CAST(sum(obs) AS BIGINT) AS ctot
         |      FROM cells GROUP BY 1),
         |t AS (SELECT CAST(sum(obs) AS BIGINT) AS total FROM cells),
         |terms AS (
         |  SELECT
         |    (CAST(obs AS DOUBLE)
         |      - CAST(rtot * ctot AS DOUBLE) / CAST(total AS DOUBLE))
         |    * (CAST(obs AS DOUBLE)
         |      - CAST(rtot * ctot AS DOUBLE) / CAST(total AS DOUBLE))
         |    / (CAST(rtot * ctot AS DOUBLE) / CAST(total AS DOUBLE))
         |      AS cell,
         |    cells.o_orderpriority, cells.o_orderstatus
         |  FROM cells JOIN r USING (o_orderpriority)
         |             JOIN c USING (o_orderstatus)
         |             CROSS JOIN t)
         |SELECT ${Stable.dsumSql("cell", 9)} AS chi_sq,
         |  CAST((count(DISTINCT o_orderpriority) - 1)
         |    * (count(DISTINCT o_orderstatus) - 1) AS BIGINT) AS dof
         |FROM terms""".stripMargin),
  )

  def queries: Seq[Q] = Seq(growth, chisq)
}
