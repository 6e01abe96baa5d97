package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (Vovk et al.; the
  * distribution-free coverage guarantee modern ML serving wraps around
  * any point model): fit the a29 per-group OLS on a deterministic
  * train half, take absolute residuals on the held-out calibration
  * half, and the interval half-width is the ⌈(n+1)(1−α)⌉-th smallest
  * calibration residual — guaranteed ≥(1−α) coverage on exchangeable
  * data, no normality assumption anywhere.
  *
  * Determinism end-to-end: the split is md5-prefix arithmetic (the
  * t_train_test_split pattern — engine/partitioning-independent), the
  * coefficients are PUBLISHED ROUNDED and residuals are computed from
  * the rounded values (so every residual is the same IEEE double in
  * both engines), the quantile position k = ⌈9(n+1)/10⌉ is pure
  * integer algebra, and the order statistic comes off the count table
  * (the [[graft.util.OrderStats]] discipline — no per-group value
  * buffering).
  *
  * Scale: two conditional-sum aggregates over the fact table (train
  * fit, then one residual pass) + a count-table window per group.
  */
object Conformal {

  /** α = 0.1 → k = ⌈9(n_cal+1)/10⌉. */
  val AlphaNumer = 9
  val AlphaDenom = 10

  private val q = Q(
    "a63_conformal_interval",
    (s, d) => {
      val base = Tables(s, d).orders.select(
        col("o_orderpriority").as("grp"),
        datediff(to_date(col("o_orderdate")),
          to_date(lit("1992-01-01"))).cast("long").as("x"),
        round(col("o_totalprice") * 100).cast("long").as("y_c"),
        (conv(substring(md5(col("o_orderkey").cast("string")), 1, 4),
          16, 10).cast("int") % 2).as("fold"))
      val train = base.filter(col("fold") === 0)
      val stats = train.groupBy("grp").agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y_c")).as("sy_c"),
        sum(col("x") * col("y_c")).as("sxy_c"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val fit = stats
        .withColumn("slope", round(
          (dec(col("n")) * dec(col("sxy_c")) -
            dec(col("sx")) * dec(col("sy_c"))).cast("double") /
          (dec(col("n")) * dec(col("sxx")) -
            dec(col("sx")) * dec(col("sx"))).cast("double"), 6))
        .withColumn("icept", round(
          (col("sy_c").cast("double") -
            col("slope") * col("sx").cast("double")) /
            col("n").cast("double"), 4))
        .select(col("grp"), col("n").as("n_train"), col("slope"),
          col("icept"))
      val resid = base.filter(col("fold") === 1)
        .join(broadcast(fit), "grp")
        .select(col("grp"), col("n_train"), col("slope"), col("icept"),
          abs(col("y_c").cast("double") -
            (col("slope") * col("x").cast("double") + col("icept")))
            .as("r"))
      val counts = resid.groupBy("grp", "n_train", "slope", "icept", "r")
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("grp").orderBy("r")
      val ranked = counts
        .withColumn("cum", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      val withK = ranked
        .withColumn("n_cal", sum(col("c")).over(
          Window.partitionBy("grp")))
        .withColumn("k", least(
          expr(s"($AlphaNumer * (n_cal + 1) + $AlphaDenom - 1)" +
            s" div $AlphaDenom"),
          col("n_cal")))
      withK.filter(col("cum") >= col("k"))
        .groupBy("grp", "n_train", "slope", "icept", "n_cal", "k")
        .agg(min(col("r")).as("q_hat"))
        .select(col("grp"), col("n_train"), col("n_cal"), col("k"),
          col("slope"), col("icept"), round(col("q_hat"), 6).as("q_hat"))
    },
    Some(
      s"""WITH base AS (
         |  SELECT o_orderpriority AS grp,
         |    CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
         |      AS x,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS y_c,
         |    CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)),
         |      1, 4)) AS INTEGER) % 2 AS fold
         |  FROM orders),
         |stats AS (
         |  SELECT grp, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
         |    sum(y_c) AS sy_c, sum(x * y_c) AS sxy_c
         |  FROM base WHERE fold = 0 GROUP BY 1),
         |fit AS (
         |  SELECT grp, CAST(n AS BIGINT) AS n_train,
         |    round(CAST(CAST(n AS HUGEINT) * sxy_c - sx * sy_c AS DOUBLE)
         |      / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE), 6)
         |      AS slope, sx, sy_c, n
         |  FROM stats),
         |fit2 AS (
         |  SELECT grp, n_train, slope,
         |    round((CAST(sy_c AS DOUBLE) - slope * CAST(sx AS DOUBLE))
         |      / CAST(n AS DOUBLE), 4) AS icept
         |  FROM fit),
         |resid AS (
         |  SELECT b.grp, f.n_train, f.slope, f.icept,
         |    abs(CAST(b.y_c AS DOUBLE)
         |      - (f.slope * CAST(b.x AS DOUBLE) + f.icept)) AS r
         |  FROM base b JOIN fit2 f ON b.grp = f.grp
         |  WHERE b.fold = 1),
         |counts AS (
         |  SELECT grp, n_train, slope, icept, r, count(*) AS c
         |  FROM resid GROUP BY 1, 2, 3, 4, 5),
         |ranked AS (
         |  SELECT *,
         |    CAST(sum(c) OVER (PARTITION BY grp ORDER BY r
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum,
         |    CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n_cal
         |  FROM counts),
         |withk AS (
         |  SELECT *, least(($AlphaNumer * (n_cal + 1) + $AlphaDenom - 1)
         |    // $AlphaDenom, n_cal) AS k
         |  FROM ranked)
         |SELECT grp, n_train, n_cal, CAST(k AS BIGINT) AS k, slope, icept,
         |  round(min(r), 6) AS q_hat
         |FROM withk WHERE cum >= k
         |GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
