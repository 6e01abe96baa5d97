package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Cross-correlation function — w20's ACF generalised to TWO series:
  * which lag of daily order placements best lines up with daily
  * line-item shipments (lead/lag discovery between a pair of business
  * metrics). For each lag ℓ ∈ [−7, 7],
  *
  *   r(ℓ) = Pearson( x_t , y_{t+ℓ} )  over days where both exist,
  *
  * computed per-lag from the five raw BIGINT moments
  * (n, Σx, Σy, Σx², Σy², Σxy) so every r is one deterministic IEEE
  * expression over exact integers — no per-row doubles, no
  * order-dependence.
  *
  * Shape: both fact tables collapse to their |days| spines first
  * (two aggregates); the ×15 lag fan-out and the shifted equi-join
  * run on spines (calendar-bounded, constant in corpus size). At
  * 100 TB the cost is the two fact scans — the CCF itself is free.
  */
object CrossCorrelation {

  private val q = Q(
    "w27_ccf_lags",
    (s, d) => {
      val t = Tables(s, d)
      val x = t.orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("x"))
      val y = t.lineitem
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(count(lit(1)).as("y"))
      val fan = x
        .select(col("day"), col("x"),
          explode(sequence(lit(-7), lit(7))).as("lag"))
        .withColumn("yday", date_add(col("day"), col("lag")))
      fan.join(y.withColumnRenamed("day", "yday"), "yday")
        .groupBy("lag")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("lag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double")), 6).as("ccf"))
        .orderBy("lag")
    },
    Some(
      """WITH x AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x
        |  FROM orders GROUP BY 1),
        |y AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day, count(*) AS y
        |  FROM lineitem GROUP BY 1),
        |fan AS (
        |  SELECT x.day, x.x, l.lag,
        |    x.day + CAST(l.lag AS INTEGER) AS yday
        |  FROM x CROSS JOIN
        |    (SELECT unnest(generate_series(-7, 7)) AS lag) l),
        |m AS (
        |  SELECT lag, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM fan JOIN y ON fan.yday = y.day
        |  GROUP BY 1)
        |SELECT CAST(lag AS INTEGER) AS lag, n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |         * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS ccf
        |FROM m ORDER BY lag""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
