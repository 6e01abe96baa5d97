package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rank-based and covariate-adjusted statistics: Spearman correlation
  * (monotone dependence, robust to the outliers that bend a20's
  * Pearson) and CUPED variance reduction (the experimentation-platform
  * standard for tightening A/B confidence intervals).
  */
object RankStats {

  private val dec = DecimalType(38, 0)

  /** Average tie-ranks DOUBLED so they stay integral: a value with
    * cumulative predecessor count p and multiplicity c gets
    * 2·avgrank = 2p + c + 1. Built from the per-(group, value) count
    * table + one cumulative window over distinct values (the
    * OrderStats layout), joined back onto rows by value.
    */
  private def rank2(df: DataFrame, group: String, v: String,
      out: String): DataFrame = {
    val counts = df.groupBy(col(group), col(v))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(group).orderBy(v)
    counts
      .withColumn("cum", sum(col("c")).over(w))
      .select(col(group), col(v),
        (lit(2L) * (col("cum") - col("c")) + col("c") + 1L).as(out))
  }

  /** Spearman rank correlation per group (tie-corrected): Pearson over
    * the doubled average ranks — Pearson is affine-invariant, so the
    * doubling changes nothing while keeping every moment an exact
    * DECIMAL(38,0). Shape: two count-table rank builds + two
    * row-stream joins + one five-moment agg (the d23 discipline).
    */
  private val spearman = Q(
    "a50_spearman",
    (s, d) => {
      val li = Tables(s, d).lineitem.select(col("l_returnflag").as("g"),
        col("l_quantity").as("x"), col("l_extendedprice").as("y"))
      val rx = rank2(li, "g", "x", "rx")
      val ry = rank2(li, "g", "y", "ry")
      val ranked = li.join(rx, Seq("g", "x")).join(ry, Seq("g", "y"))
      // Five decimal(38,0) moment sums forced the UnsafeRow byte-buffer
      // aggregation path (BigDecimal per row — the a99/a40 finding, opt
      // guide §1.2). The doubled ranks are nonnegative integers, so
      // every moment is computable as exact LONG limb sums: split each
      // rank r = rh·2²¹ + rl (rh, rl < 2²¹ while r < 2⁴²), expand the
      // products — r_x·r_y = hh·2⁴² + (h_x·l_y + l_x·h_y)·2²¹ + ll,
      // r² = h²·2⁴² + 2hl·2²¹ + l² — and SplitSum each term (33 plain
      // long sums, all codegen + map-side combinable), reassembling the
      // exact decimals once per group. Bounds, all ANSI-safe: every
      // per-row term < 2⁴³; limb sums overflow only past 2⁴² rows/group;
      // rh < 2²¹ needs r < 2⁴² i.e. n < 2⁴¹ rows/group — both far past
      // the formula's OWN precision bound (m·sxx − sx² fits decimal 38
      // only while n ≲ 1.3e9 rows/group, unchanged here and matched by
      // the oracle's 128-bit HUGEINT). The reassembled moments are the
      // same exact integers the decimal sums produced → rho is
      // bit-identical.
      val M21 = (1L << 21) - 1
      def hi(c: org.apache.spark.sql.Column) = shiftright(c, 21)
      def lo(c: org.apache.spark.sql.Column) = c.bitwiseAND(lit(M21))
      val (hx, lx) = (hi(col("rx")), lo(col("rx")))
      val (hy, ly) = (hi(col("ry")), lo(col("ry")))
      import graft.util.SplitSum
      val limbs =
        SplitSum.sums(col("rx"), "sx") ++ SplitSum.sums(col("ry"), "sy") ++
          SplitSum.sums(hx * hy, "xyh") ++
          SplitSum.sums(hx * ly + lx * hy, "xym") ++
          SplitSum.sums(lx * ly, "xyl") ++
          SplitSum.sums(hx * hx, "xxh") ++
          SplitSum.sums(hx * lx * lit(2L), "xxm") ++
          SplitSum.sums(lx * lx, "xxl") ++
          SplitSum.sums(hy * hy, "yyh") ++
          SplitSum.sums(hy * ly * lit(2L), "yym") ++
          SplitSum.sums(ly * ly, "yyl")
      val k2 = lit(1L << 42)
      val k1 = lit(1L << 21)
      def mom(p: String) =
        SplitSum.total(s"${p}h") * k2 + SplitSum.total(s"${p}m") * k1 +
          SplitSum.total(s"${p}l")
      ranked.groupBy(col("g").as("l_returnflag"))
        .agg(count(lit(1)).cast(dec).as("m"), limbs: _*)
        .select(col("l_returnflag"), col("m"),
          SplitSum.total("sx").as("sx"), SplitSum.total("sy").as("sy"),
          mom("xy").as("sxy"), mom("xx").as("sxx"), mom("yy").as("syy"))
        .select(col("l_returnflag"), col("m").cast("long").as("n"),
          // zero rank variance (an all-tied column) → rho undefined:
          // explicit NULL, not a divide (ANSI throws on /0 and the
          // engines disagree on NaN-vs-null)
          when(col("m") * col("sxx") - col("sx") * col("sx") > 0 &&
              col("m") * col("syy") - col("sy") * col("sy") > 0,
            round(
              (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
                sqrt((col("m") * col("sxx") - col("sx") * col("sx"))
                  .cast("double") *
                  (col("m") * col("syy") - col("sy") * col("sy"))
                    .cast("double")), 6)).as("rho"))
    },
    Some(
      """WITH li AS (
        |  SELECT l_returnflag AS g, l_quantity AS x,
        |    l_extendedprice AS y
        |  FROM lineitem),
        |cx AS (SELECT g, x, count(*) AS c FROM li GROUP BY 1, 2),
        |rx AS (
        |  SELECT g, x,
        |    2 * (sum(c) OVER (PARTITION BY g ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
        |      + c + 1 AS rx
        |  FROM cx),
        |cy AS (SELECT g, y, count(*) AS c FROM li GROUP BY 1, 2),
        |ry AS (
        |  SELECT g, y,
        |    2 * (sum(c) OVER (PARTITION BY g ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
        |      + c + 1 AS ry
        |  FROM cy),
        |ranked AS (
        |  SELECT li.g, rx.rx, ry.ry
        |  FROM li JOIN rx ON li.g = rx.g AND li.x = rx.x
        |          JOIN ry ON li.g = ry.g AND li.y = ry.y),
        |mom AS (
        |  -- HUGEINT sums/products (exact 128-bit): decimal casts here
        |  -- would overflow width 38 on the cross products and DuckDB
        |  -- silently degrades those to DOUBLE
        |  SELECT g, count(*) AS m,
        |    sum(rx) AS sx, sum(ry) AS sy,
        |    sum(rx * ry) AS sxy, sum(rx * rx) AS sxx,
        |    sum(ry * ry) AS syy
        |  FROM ranked GROUP BY 1)
        |SELECT g AS l_returnflag, CAST(m AS BIGINT) AS n,
        |  CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
        |  THEN round(CAST(m * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
        |       * CAST(m * syy - sy * sy AS DOUBLE)), 6) END AS rho
        |FROM mom""".stripMargin),
  )

  /** CUPED adjustment (Deng et al., WSDM'13): per experiment arm,
    * mean(y) − θ·(mean(x) − mean_pooled(x)) with θ = cov(x,y)/var(x)
    * from POOLED exact moments — the covariate here is the pre-period
    * spend decile (derived, deterministic). One corpus aggregate for
    * the pooled moments (broadcast back) + one per-arm aggregate;
    * money sums decimal-exact, θ and the adjustment one IEEE chain.
    */
  private val cuped = Q(
    "a51_cuped",
    (s, d) => {
      val mdec = DecimalType(30, 2)
      val o = Tables(s, d).orders.select(
        (col("o_orderkey") % 2).as("arm"),
        col("o_totalprice").cast(mdec).as("y"),
        // pre-period covariate: spend bucketed to hundreds (exact)
        (floor(col("o_totalprice") / 100.0) * 100).cast(mdec).as("x"))
      val pooled = o.agg(
        count(lit(1)).cast(dec).as("pn"),
        sum(col("x")).as("psx"), sum(col("y")).as("psy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 4))).as("psxx"),
        sum((col("x") * col("y")).cast(DecimalType(38, 4))).as("psxy"))
      val arms = o.groupBy("arm").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("ax"), sum(col("y")).as("ay"))
      // theta combines decimal aggregates whose PRODUCTS would
      // overflow decimal width 38 (DuckDB silently degrades those to
      // DOUBLE) — so each aggregate converts to double FIRST and the
      // combination is one fixed IEEE chain, identical on both engines
      def dd(c: org.apache.spark.sql.Column) = c.cast("double")
      arms.crossJoin(broadcast(pooled))
        .select(col("arm"), col("n"),
          round(dd(col("ay")) / dd(col("n")), 6).as("mean_y"),
          round(
            dd(col("ay")) / dd(col("n")) -
              ((dd(col("pn")) * dd(col("psxy")) - dd(col("psx")) * dd(col("psy"))) /
                (dd(col("pn")) * dd(col("psxx")) - dd(col("psx")) * dd(col("psx")))) *
                (dd(col("ax")) / dd(col("n")) - dd(col("psx")) / dd(col("pn"))),
            6).as("mean_y_cuped"))
    },
    Some(
      """WITH o AS (
        |  SELECT o_orderkey % 2 AS arm,
        |    CAST(o_totalprice AS DECIMAL(30,2)) AS y,
        |    CAST(floor(o_totalprice / 100.0) * 100 AS DECIMAL(30,2)) AS x
        |  FROM orders),
        |pooled AS (
        |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS pn,
        |    sum(x) AS psx, sum(y) AS psy,
        |    sum(CAST(x * x AS DECIMAL(38,4))) AS psxx,
        |    sum(CAST(x * y AS DECIMAL(38,4))) AS psxy
        |  FROM o),
        |arms AS (
        |  SELECT arm, count(*) AS n, sum(x) AS ax, sum(y) AS ay
        |  FROM o GROUP BY 1)
        |SELECT arm, n,
        |  round(CAST(ay AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_y,
        |  round(CAST(ay AS DOUBLE) / CAST(n AS DOUBLE)
        |    - ((CAST(pn AS DOUBLE) * CAST(psxy AS DOUBLE)
        |        - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE))
        |       / (CAST(pn AS DOUBLE) * CAST(psxx AS DOUBLE)
        |          - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE)))
        |      * (CAST(ax AS DOUBLE) / CAST(n AS DOUBLE)
        |         - CAST(psx AS DOUBLE) / CAST(pn AS DOUBLE)), 6)
        |    AS mean_y_cuped
        |FROM arms CROSS JOIN pooled""".stripMargin),
  )

  def all: Seq[Q] = Seq(spearman, cuped)
}
