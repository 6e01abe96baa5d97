package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Information-theoretic and dominance analytics over exact counts —
  * three operators the reference's pandas EDA layer reaches for via
  * scipy/numpy one-liners (SURVEY §2.4; `dqa` notebooks) that need a
  * distributed formulation at 100 TB: lagged autocorrelation of a
  * daily series, mutual information between two categorical columns,
  * and the 2-D Pareto frontier (skyline).
  */
object InfoStats {

  private val dec = DecimalType(38, 0)

  val AcfMaxLag = 7

  /** Autocorrelation of the daily order-count series at lags 1..7 —
    * the seasonality detector behind `w17_mom_yoy_growth` and
    * `e_forecast_mase`'s naive-seasonal denominator: a weekly cadence
    * shows as a spike at lag 7. Computed as the exact-moment Pearson
    * correlation of (x_t, x_{t−l}) pairs (the same DECIMAL(38,0)
    * five-sum discipline as `d23_assortativity`; one IEEE
    * multiply-sqrt-divide chain at the end, bit-exact cross-engine).
    *
    * Shape: one date-keyed count agg, ONE global sort carrying all
    * seven lag columns (the window is over |distinct dates| rows —
    * calendar-bounded, ~2.4k/decade, never data-scaled), one stack +
    * per-lag hash agg.
    */
  private val acf = Q(
    "w20_acf_lags",
    (s, d) => {
      val daily = Tables(s, d).orders
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.orderBy("day")
      val lagged = daily.select(
        (col("x") +: (1 to AcfMaxLag).map(l =>
          lag(col("x"), l).over(w).as(s"l$l"))): _*)
      val stacked = lagged.select(col("x"), expr(
        s"stack($AcfMaxLag, " +
          (1 to AcfMaxLag).map(l => s"${l}L, l$l").mkString(", ") +
          ") AS (lag, y)"))
        .filter(col("y").isNotNull)
      stacked.groupBy("lag").agg(
          count(lit(1)).cast(dec).as("m"),
          sum(col("x").cast(dec)).as("sx"),
          sum(col("y").cast(dec)).as("sy"),
          sum((col("x").cast(dec) * col("y").cast(dec))).as("sxy"),
          sum((col("x").cast(dec) * col("x").cast(dec))).as("sxx"),
          sum((col("y").cast(dec) * col("y").cast(dec))).as("syy"))
        .select(col("lag"), col("m").cast("long").as("n_pairs"),
          // constant series → zero variance → NULL, not an ANSI /0
          when(col("m") * col("sxx") - col("sx") * col("sx") > 0 &&
              col("m") * col("syy") - col("sy") * col("sy") > 0,
            round(
              (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
                sqrt((col("m") * col("sxx") - col("sx") * col("sx"))
                  .cast("double") *
                  (col("m") * col("syy") - col("sy") * col("sy"))
                    .cast("double")), 6)).as("acf"))
    },
    Some {
      val lagCols = (1 to AcfMaxLag)
        .map(l => s"lag(x, $l) OVER (ORDER BY day) AS l$l").mkString(", ")
      val stack = (1 to AcfMaxLag)
        .map(l => s"SELECT CAST($l AS BIGINT) AS lag, x, l$l AS y FROM lagged")
        .mkString("\n  UNION ALL ")
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, count(*) AS x
         |  FROM orders GROUP BY 1),
         |lagged AS (SELECT x, $lagCols FROM daily),
         |pairs AS (
         |  $stack),
         |mom AS (
         |  SELECT lag, CAST(count(*) AS DECIMAL(38,0)) AS m,
         |    sum(CAST(x AS DECIMAL(38,0))) AS sx,
         |    sum(CAST(y AS DECIMAL(38,0))) AS sy,
         |    sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy,
         |    sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
         |    sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy
         |  FROM pairs WHERE y IS NOT NULL GROUP BY 1)
         |SELECT lag, CAST(m AS BIGINT) AS n_pairs,
         |  CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
         |  THEN round(CAST(m * sxy - sx * sy AS DOUBLE) /
         |    sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
         |       * CAST(m * syy - sy * sy AS DOUBLE)), 6) END AS acf
         |FROM mom""".stripMargin
    },
  )

  /** Mutual information I(X;Y) between order priority and order status
    * in nats — the dependence measure `a42_chisq_independence` tests
    * but does not quantify (MI is the KL divergence between the joint
    * and the product of margins; the feature-selection score for
    * categorical columns). Exact cell/margin counts; the only floats
    * are |cells| ln() terms summed decimal-stably at 9 dp and rounded
    * to 4 (the `t_char_entropy` log discipline).
    *
    * Shape: one (x,y) hash agg + two broadcast margin joins + a
    * single-row global agg — |distinct X|·|distinct Y| intermediate
    * rows, never data-scaled.
    */
  private val mi = Q(
    "a44_mutual_info",
    (s, d) => {
      val o = Tables(s, d).orders
      val cells = o.groupBy(col("o_orderpriority").as("x"),
          col("o_orderstatus").as("y"))
        .agg(count(lit(1)).as("c"))
      val mx = cells.groupBy("x").agg(sum(col("c")).as("cx"))
      val my = cells.groupBy("y").agg(sum(col("c")).as("cy"))
      val n = cells.agg(sum(col("c")).as("n"))
      cells.join(broadcast(mx), "x").join(broadcast(my), "y")
        .crossJoin(broadcast(n))
        .select(col("c"), col("n"),
          (col("c").cast("double") / col("n").cast("double") *
            log((col("c").cast("double") * col("n").cast("double")) /
              (col("cx").cast("double") * col("cy").cast("double"))))
            .as("term"))
        .agg(count(lit(1)).as("n_cells"), max(col("n")).as("n"),
          round(Stable.dsum(col("term"), 9), 4).as("mi_nats"))
    },
    Some(
      s"""WITH cells AS (
         |  SELECT o_orderpriority AS x, o_orderstatus AS y,
         |    count(*) AS c
         |  FROM orders GROUP BY 1, 2),
         |mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx
         |       FROM cells GROUP BY 1),
         |my AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy
         |       FROM cells GROUP BY 1),
         |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
         |terms AS (
         |  SELECT cells.c, n.n,
         |    CAST(cells.c AS DOUBLE) / CAST(n.n AS DOUBLE) *
         |      ln((CAST(cells.c AS DOUBLE) * CAST(n.n AS DOUBLE)) /
         |         (CAST(mx.cx AS DOUBLE) * CAST(my.cy AS DOUBLE)))
         |      AS term
         |  FROM cells JOIN mx ON cells.x = mx.x
         |             JOIN my ON cells.y = my.y
         |             CROSS JOIN n)
         |SELECT count(*) AS n_cells, max(n) AS n,
         |  round(${Stable.dsumSql("term", 9)}, 4) AS mi_nats
         |FROM terms""".stripMargin),
  )

  /** 2-D skyline / Pareto frontier over parts: minimise retail price,
    * maximise size — the points no other part dominates (price ≤ ∧
    * size ≥, one strict). The multi-objective complement to
    * `a43_abc_pareto`'s single-axis cumulative cut.
    *
    * Shape: the price→max(size) hash agg IS the distributed prefilter
    * (only each price's largest size can survive, so the global step
    * sees ≤ |distinct prices| rows, map-side combined), then one sort +
    * running-max scan — the textbook sort-filter skyline.
    */
  private val skyline = Q(
    "a45_skyline",
    (s, d) => {
      val best = Tables(s, d).part
        .groupBy(col("p_retailprice").as("price"))
        .agg(max(col("p_size")).as("size"))
      val w = Window.orderBy(asc("price"))
      best
        .withColumn("prevmax",
          max(col("size")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("prevmax").isNull || col("size") > col("prevmax"))
        .select(col("price"), col("size"))
    },
    Some(
      """WITH best AS (
        |  SELECT p_retailprice AS price, max(p_size) AS size
        |  FROM part GROUP BY 1),
        |scanned AS (
        |  SELECT price, size,
        |    max(size) OVER (ORDER BY price
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prevmax
        |  FROM best)
        |SELECT price, size FROM scanned
        |WHERE prevmax IS NULL OR size > prevmax""".stripMargin),
  )

  def all: Seq[Q] = Seq(acf, mi, skyline)
}
