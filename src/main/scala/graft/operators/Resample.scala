package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Series resampling: M4 downsampling for visualisation and linear
  * interpolation for gap repair — the two directions a 100 TB
  * time-series store moves along the resolution axis. Both stay exact:
  * M4 selects real rows (no synthesis), interpolation emits the exact
  * rational (numerator, denominator) beside the rounded display value.
  */
object Resample {

  /** Number of M4 pixel-buckets. */
  val Buckets = 50

  /** M4 downsampling (Jugel et al., VLDB 2014): per time-bucket keep
    * min/max/first/last of the value — the four rows that make a
    * line-chart of the bucket pixel-identical to the full series.
    * Buckets are date arithmetic against the series span (broadcast
    * 1-row bounds), so rows map to buckets without a sort; the whole
    * operator is two hash aggs + one broadcast.
    */
  private val m4 = Q(
    "w21_m4_downsample",
    (s, d) => {
      val daily = Tables(s, d).orders
        .groupBy(col("o_orderdate").as("day"))
        .agg(sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DataTypes
              .createDecimalType(12, 2)))
          .cast("double").as("v"))
      val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      daily.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          expr(s"CAST(datediff(day, d0) AS BIGINT) * $Buckets" +
            " div (CAST(datediff(d1, d0) AS BIGINT) + 1)"))
        .groupBy("bucket")
        .agg(
          min(col("v")).as("v_min"),
          max(col("v")).as("v_max"),
          min_by(col("v"), col("day")).as("v_first"),
          max_by(col("v"), col("day")).as("v_last"),
          min(col("day")).as("b_start"),
          max(col("day")).as("b_end"),
          count(lit(1)).as("n_days"))
    },
    Some(
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS v
         |  FROM orders GROUP BY 1),
         |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily)
         |SELECT
         |  CAST(datediff('day', b.d0, daily.day) AS BIGINT) * $Buckets
         |    // (CAST(datediff('day', b.d0, b.d1) AS BIGINT) + 1) AS bucket,
         |  min(v) AS v_min, max(v) AS v_max,
         |  arg_min(v, day) AS v_first, arg_max(v, day) AS v_last,
         |  min(day) AS b_start, max(day) AS b_end,
         |  count(*) AS n_days
         |FROM daily CROSS JOIN b
         |GROUP BY 1""".stripMargin),
  )

  /** Observation cadence: every 3rd day of the series is "observed". */
  val Stride = 3

  /** Linear interpolation of a gappy daily series: days between two
    * observations get prev + (next−prev)·offset/gap, emitted as the
    * EXACT integer rational (v_num, v_den) plus one rounded display
    * double — so the oracle hashes integers and the display value is a
    * single deterministic IEEE divide. Bracketing via last/first
    * IGNORE NULLS windows (the LOCF machinery of w14, pointed both
    * directions); days after the final observation have no bracket and
    * are dropped by contract (LOCF, not extrapolation, covers them).
    *
    * The demonstration series is the daily order count with every
    * non-stride day masked to a gap; counts are exact longs.
    */
  private val interp = Q(
    "w22_linear_interpolate",
    (s, d) => {
      val daily = Tables(s, d).orders
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("x"))
      val bounds = daily.agg(min(col("day")).as("d0"))
      val marked = daily.crossJoin(broadcast(bounds))
        .withColumn("t", expr("CAST(datediff(day, d0) AS BIGINT)"))
        .withColumn("obs",
          when(col("t") % Stride === 0, col("x")))
        .withColumn("obs_t",
          when(col("t") % Stride === 0, col("t")))
      val w = Window.orderBy("t")
      val prevV = last(col("obs"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
      val prevT = last(col("obs_t"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
      val nextV = first(col("obs"), ignoreNulls = true)
        .over(w.rowsBetween(0, Window.unboundedFollowing))
      val nextT = first(col("obs_t"), ignoreNulls = true)
        .over(w.rowsBetween(0, Window.unboundedFollowing))
      marked
        .withColumn("pv", prevV).withColumn("pt", prevT)
        .withColumn("nv", nextV).withColumn("nt", nextT)
        .filter(col("pv").isNotNull && col("nv").isNotNull)
        .select(col("day"), (col("t") % Stride === 0).as("is_obs"),
          when(col("nt") === col("pt"), col("pv"))
            .otherwise(col("pv") * (col("nt") - col("t")) +
              col("nv") * (col("t") - col("pt"))).as("v_num"),
          when(col("nt") === col("pt"), lit(1L))
            .otherwise(col("nt") - col("pt")).as("v_den"))
        .withColumn("value",
          round(col("v_num").cast("double") / col("v_den").cast("double"), 6))
    },
    Some(
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, count(*) AS x
         |  FROM orders GROUP BY 1),
         |b AS (SELECT min(day) AS d0 FROM daily),
         |marked AS (
         |  SELECT day, x,
         |    CAST(datediff('day', b.d0, daily.day) AS BIGINT) AS t,
         |    CASE WHEN CAST(datediff('day', b.d0, daily.day) AS BIGINT)
         |      % $Stride = 0 THEN x END AS obs,
         |    CASE WHEN CAST(datediff('day', b.d0, daily.day) AS BIGINT)
         |      % $Stride = 0
         |      THEN CAST(datediff('day', b.d0, daily.day) AS BIGINT)
         |    END AS obs_t
         |  FROM daily CROSS JOIN b),
         |brk AS (
         |  SELECT day, t,
         |    last_value(obs IGNORE NULLS) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         |    last_value(obs_t IGNORE NULLS) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         |    first_value(obs IGNORE NULLS) OVER (ORDER BY t
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         |    first_value(obs_t IGNORE NULLS) OVER (ORDER BY t
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
         |  FROM marked)
         |SELECT day, t % $Stride = 0 AS is_obs,
         |  CAST(CASE WHEN nt = pt THEN pv
         |    ELSE pv * (nt - t) + nv * (t - pt) END AS BIGINT) AS v_num,
         |  CAST(CASE WHEN nt = pt THEN 1 ELSE nt - pt END AS BIGINT)
         |    AS v_den,
         |  round(CAST(CASE WHEN nt = pt THEN pv
         |      ELSE pv * (nt - t) + nv * (t - pt) END AS DOUBLE) /
         |    CAST(CASE WHEN nt = pt THEN 1 ELSE nt - pt END AS DOUBLE), 6)
         |    AS value
         |FROM brk
         |WHERE pv IS NOT NULL AND nv IS NOT NULL""".stripMargin),
  )

  def all: Seq[Q] = Seq(m4, interp)
}
