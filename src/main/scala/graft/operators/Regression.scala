package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Group-wise ordinary least squares — closed-form per-segment trend
  * fitting (slope/intercept per key from the five sufficient
  * statistics), the "is this segment growing?" analytics primitive and
  * the distributed shape every per-group model fit reduces to: sufficient
  * statistics are map-side-combinable sums, so the fit is ONE hash
  * aggregate over the corpus plus per-group scalar algebra — no
  * iteration, no solver, |groups| rows of state.
  *
  * Exactness: x is integer days, y is scaled to integer cents, so all
  * five sums are exact BIGINTs; slope numerator/denominator are exact
  * 128-bit products (DECIMAL(38,0) / HUGEINT — n·Σxy overflows a
  * 64-bit long at sf0.1 already), and only the final slope/intercept
  * divisions run in floating point, as the identical op sequence in
  * both engines.
  */
object Regression {

  private val q = Q(
    "a29_groupwise_ols",
    (s, d) => {
      val base = Tables(s, d).orders.select(
        col("o_orderpriority").as("grp"),
        datediff(to_date(col("o_orderdate")),
          to_date(lit("1992-01-01"))).cast("long").as("x"),
        round(col("o_totalprice") * 100).cast("long").as("y_c"))
      val stats = base.groupBy("grp").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y_c")).as("sy_c"),
        sum(col("x") * col("y_c")).as("sxy_c"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val num = dec(col("n")) * dec(col("sxy_c")) -
        dec(col("sx")) * dec(col("sy_c"))
      val den = dec(col("n")) * dec(col("sxx")) -
        dec(col("sx")) * dec(col("sx"))
      stats
        .withColumn("slope_cents_per_day",
          round(num.cast("double") / den.cast("double"), 6))
        .withColumn("intercept_cents",
          round((col("sy_c").cast("double") -
            col("slope_cents_per_day") * col("sx").cast("double")) /
            col("n").cast("double"), 4))
        .select("grp", "n", "slope_cents_per_day", "intercept_cents")
    },
    Some(
      """WITH base AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
        |      AS x,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS y_c
        |  FROM orders),
        |stats AS (
        |  SELECT grp, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
        |    sum(y_c) AS sy_c, sum(x * y_c) AS sxy_c
        |  FROM base GROUP BY 1),
        |fit AS (
        |  SELECT grp, n,
        |    round(CAST(CAST(n AS HUGEINT) * sxy_c - sx * sy_c AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE), 6)
        |      AS slope_cents_per_day,
        |    sx, sy_c
        |  FROM stats)
        |SELECT grp, CAST(n AS BIGINT) AS n, slope_cents_per_day,
        |  round((CAST(sy_c AS DOUBLE) -
        |    slope_cents_per_day * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE),
        |    4) AS intercept_cents
        |FROM fit""".stripMargin),
  )

  /** Median-absolute-deviation outlier audit — the robust-statistics
    * sibling of the z-score screens (`w12_rolling_zscore` assumes the
    * mean/σ are trustworthy; MAD's 50% breakdown point survives the
    * very outliers under test — the standard robust scale estimator,
    * e.g. Rousseeuw & Croux 1993). Two exact-percentile aggregates
    * (the np.percentile-parity machinery of a4) around one group-keyed
    * join: med per group, deviations as a pure map, MAD per group, and
    * the outlier count at the 3·MAD fence. Deviations are exact double
    * subtractions and the fence one multiply+compare, so the whole
    * audit is engine-exact despite being float-valued.
    */
  private val mad = Q(
    "a30_mad_outliers",
    (s, d) => {
      val ev = Tables(s, d).events.select("event_type", "value")
      val med = ev.groupBy("event_type")
        .agg(percentile(col("value"), lit(0.5)).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
      // med is constant within a group, so first() is deterministic here
      val stats = dev.groupBy("event_type")
        .agg(first(col("med")).as("med"),
          percentile(col("dev"), lit(0.5)).as("mad"),
          count(lit(1)).as("n"))
      val out = dev
        .join(broadcast(stats.select("event_type", "mad")), "event_type")
        .filter(col("dev") > lit(3.0) * col("mad"))
        .groupBy("event_type").agg(count(lit(1)).as("n_outliers"))
      stats.join(out, Seq("event_type"), "left")
        .select(col("event_type"), col("med"), col("mad"), col("n"),
          coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
    },
    Some(
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
        |  FROM events e JOIN med m USING (event_type)),
        |st AS (
        |  SELECT event_type, any_value(med) AS med,
        |    quantile_cont(dev, 0.5) AS mad, count(*) AS n
        |  FROM dev GROUP BY 1),
        |outl AS (
        |  SELECT dev.event_type, count(*) AS n_outliers
        |  FROM dev JOIN st USING (event_type)
        |  WHERE dev.dev > 3.0 * st.mad
        |  GROUP BY 1)
        |SELECT st.event_type, st.med, st.mad, CAST(st.n AS BIGINT) AS n,
        |  CAST(coalesce(outl.n_outliers, 0) AS BIGINT) AS n_outliers
        |FROM st LEFT JOIN outl USING (event_type)""".stripMargin),
  )

  /** Association rules over order baskets (market-basket lift): for
    * part pairs co-occurring in ≥ [[LiftMinSupport]] orders, emit
    * support counts and lift = P(a,b)/(P(a)·P(b)) as the EXACT rational
    * (lift_num = c_ab·N, lift_den = c_a·c_b) plus one IEEE division —
    * the integer-exact discipline of modularity/drift again, so the
    * gate hashes integers. The same shape mines skill co-occurrence
    * rules from exploded skill lists in the domain layer.
    *
    * Scale: the pair space is Σ|basket|² like every blocking join here
    * — baskets are small and bounded (order lines), so the self-join is
    * shuffle-bounded by the basket key; item marginals join back as a
    * broadcast-sized dim (|items|, not |pairs|).
    */
  private val LiftMinSupport = 3L

  private val lift = Q(
    "a32_association_lift",
    (s, d) => {
      // r08 (guide §2.4 + the LinkPrediction pattern): the former
      // `items` (distinct order–part) frame was rebuilt FOUR times
      // (marginals, order count, both self-join sides). One per-order
      // set aggregation + a lazy lineage cut now feeds all three
      // consumers: marginals explode the sets (set ≙ distinct),
      // the order count is the group count, and the pair space is the
      // identical C(|basket|,2) in-array fanout (sorted sets, strict
      // a < b ≙ the former partkey < partkey predicate). Identical
      // output. Full-run warm at sf0.1 is ±0.2 s (count() had pruned
      // much of the duplicated work locally); the change is kept for
      // the cold/scale story — one build of a corpus-sized frame
      // instead of four (OPTIMIZATION_r08.md).
      val sets = Tables(s, d).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .localCheckpoint(false)
      val ca = sets.select(explode(col("ps")).as("l_partkey"))
        .groupBy("l_partkey").agg(count(lit(1)).as("c"))
      val n = sets.agg(count(lit(1)).as("n"))
      val pairs = sets
        .repartition(s.sparkContext.defaultParallelism)
        .select(explode(expr(
          """flatten(transform(ps, (p, i) ->
            |  transform(slice(ps, i + 2, size(ps)),
            |            q -> struct(p AS a, q AS b))))""".stripMargin))
          .as("e"))
        .groupBy(col("e.a").as("part_a"), col("e.b").as("part_b"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= LiftMinSupport)
      pairs
        .join(ca.select(col("l_partkey").as("part_a"), col("c").as("c_a")),
          "part_a")
        .join(ca.select(col("l_partkey").as("part_b"), col("c").as("c_b")),
          "part_b")
        .crossJoin(broadcast(n))
        .select(col("part_a"), col("part_b"), col("c_ab"), col("c_a"),
          col("c_b"),
          (col("c_ab") * col("n")).as("lift_num"),
          (col("c_a") * col("c_b")).as("lift_den"))
        .withColumn("lift", round(col("lift_num") / col("lift_den"), 6))
    },
    Some(
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |ca AS (SELECT l_partkey, count(*) AS c FROM items GROUP BY 1),
         |n AS (SELECT count(DISTINCT l_orderkey) AS n FROM items),
         |pairs AS (
         |  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
         |    count(*) AS c_ab
         |  FROM items x JOIN items y
         |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= $LiftMinSupport)
         |SELECT part_a, part_b, CAST(c_ab AS BIGINT) AS c_ab,
         |  CAST(a.c AS BIGINT) AS c_a, CAST(b.c AS BIGINT) AS c_b,
         |  CAST(c_ab * n.n AS BIGINT) AS lift_num,
         |  CAST(a.c * b.c AS BIGINT) AS lift_den,
         |  round(CAST(c_ab * n.n AS BIGINT)
         |    / CAST(a.c * b.c AS BIGINT), 6) AS lift
         |FROM pairs
         |JOIN ca a ON pairs.part_a = a.l_partkey
         |JOIN ca b ON pairs.part_b = b.l_partkey
         |CROSS JOIN n""".stripMargin),
  )

  /** A/B comparison via Welch's z — the experiment-analysis primitive
    * over the event stream: per metric (event_type), compare `value`
    * between two deterministic user buckets (user_id parity standing in
    * for the assignment hash). Sufficient statistics (n, Σv, Σv²) are
    * exact decimal accumulations per (metric, variant) — the ONLY
    * corpus-sized work, one map-side-combinable aggregate — and mean,
    * Welch variance, standard error and z are a fixed IEEE chain on
    * those exact sums, identical on any engine or partitioning. At
    * fleet scale this is the same one-pass shape with the variant map
    * joined in from the assignment service's table.
    */
  /** The SUM-mergeable sufficient statistics (n, Σv, Σv² per variant,
    * exact decimals) — identical as a batch aggregate and as a
    * Complete-mode streaming aggregate, which is what lets the
    * streaming parity row share this operator's oracle verbatim.
    */
  def abStatsAggs: Seq[org.apache.spark.sql.Column] = {
    import graft.util.Stable
    def side(tag: String, v: Int) = Seq(
      sum(when(col("variant") === v, 1L).otherwise(0L)).as(s"n_$tag"),
      Stable.dsum(when(col("variant") === v, col("value")), 6)
        .as(s"s1_$tag"),
      Stable.dsum(when(col("variant") === v, col("value") * col("value")),
        6).as(s"s2_$tag"))
    side("c", 0) ++ side("t", 1)
  }

  /** (event_type, value, variant) projection shared by batch and
    * streaming sides.
    */
  def abProject(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    events.select(col("event_type"), col("value"),
      pmod(col("user_id"), lit(2)).as("variant"))

  /** Welch finish over a drained stats frame (columns n_c..s2_t). */
  def abFinish(stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def mean(t: String) = col(s"s1_$t") / col(s"n_$t")
    def vr(t: String) =
      (col(s"s2_$t") - col(s"s1_$t") * col(s"s1_$t") / col(s"n_$t")) /
        (col(s"n_$t") - 1)
    stats.select(col("event_type"), col("n_c"), col("n_t"),
      round(mean("c"), 6).as("mean_c"), round(mean("t"), 6).as("mean_t"),
      round(vr("c"), 6).as("var_c"), round(vr("t"), 6).as("var_t"),
      round((mean("t") - mean("c")) /
        sqrt(vr("c") / col("n_c") + vr("t") / col("n_t")), 6).as("z"))
  }

  def abWelch(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val aggs = abStatsAggs
    abFinish(abProject(events).groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*))
  }

  val abOracle: Option[String] = Some {
    def dsum(e: String) = graft.util.Stable.dsumSql(e, 6)
    def n(v: Int) = s"CAST(SUM(CASE WHEN user_id % 2 = $v THEN 1 ELSE 0 END) AS BIGINT)"
    def s1(v: Int) = dsum(s"CASE WHEN user_id % 2 = $v THEN value END")
    def s2(v: Int) = dsum(s"CASE WHEN user_id % 2 = $v THEN value * value END")
    s"""WITH st AS (
       |  SELECT event_type,
       |    ${n(0)} AS n_c, ${s1(0)} AS s1_c, ${s2(0)} AS s2_c,
       |    ${n(1)} AS n_t, ${s1(1)} AS s1_t, ${s2(1)} AS s2_t
       |  FROM events GROUP BY 1)
       |SELECT event_type, n_c, n_t,
       |  round(s1_c / n_c, 6) AS mean_c,
       |  round(s1_t / n_t, 6) AS mean_t,
       |  round((s2_c - s1_c * s1_c / n_c) / (n_c - 1), 6) AS var_c,
       |  round((s2_t - s1_t * s1_t / n_t) / (n_t - 1), 6) AS var_t,
       |  round((s1_t / n_t - s1_c / n_c) /
       |    sqrt(((s2_c - s1_c * s1_c / n_c) / (n_c - 1)) / n_c
       |       + ((s2_t - s1_t * s1_t / n_t) / (n_t - 1)) / n_t), 6) AS z
       |FROM st""".stripMargin
  }

  private val ab = Q(
    "a34_ab_welch",
    (s, d) => abWelch(Tables(s, d).events),
    abOracle,
  )

  /** Theil–Sen robust trend — the 29%-breakdown sibling of a29's OLS
    * (Sen 1968): slope = median of all pairwise slopes, intercept =
    * median of y − m·x. One outlier day drags an OLS fit; the pairwise
    * median shrugs it off — the estimator monitoring pipelines want on
    * contaminated volume series. Scale: the pair space is per-KEY over
    * the TIME axis (≤ days²/2 pairs per series — bounded by the window
    * length, independent of corpus size); the corpus-sized work is the
    * same daily pre-agg every other timeseries operator shares. Exact:
    * slopes are single IEEE divisions of exact BIGINTs; the median is
    * the same exact-percentile aggregate a30 relies on.
    */
  private val theilsen = Q(
    "a35_theilsen_trend",
    (s, d) => {
      // x is rebased to each series' own first day so the intercept is
      // the level at series start, not at the 1970 epoch
      val counts = Tables(s, d).events
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val starts = counts.groupBy("event_type")
        .agg(min(col("day")).as("d0"))
      val daily = counts.join(broadcast(starts), "event_type")
        .select(col("event_type"),
          datediff(col("day"), col("d0")).cast("long").as("x"),
          col("n").cast("double").as("y"))
      val slopes = daily.alias("a")
        .join(daily.alias("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.x") < col("b.x"))
        .select(col("a.event_type").as("event_type"),
          ((col("b.y") - col("a.y")) / (col("b.x") - col("a.x")))
            .as("slope"))
      val m = slopes.groupBy("event_type")
        .agg(percentile(col("slope"), lit(0.5)).as("slope"),
          count(lit(1)).as("n_pairs"))
      daily.join(broadcast(m), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          first(col("n_pairs")).as("n_pairs"),
          round(first(col("slope")), 6).as("slope"),
          round(percentile(col("y") - col("slope") * col("x"), lit(0.5)), 6)
            .as("intercept"))
    },
    Some(
      """WITH counts AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |starts AS (
        |  SELECT event_type, min(day) AS d0 FROM counts GROUP BY 1),
        |daily AS (
        |  SELECT c.event_type,
        |    date_diff('day', s.d0, c.day) AS x,
        |    CAST(c.n AS DOUBLE) AS y
        |  FROM counts c JOIN starts s USING (event_type)),
        |slopes AS (
        |  SELECT a.event_type, (b.y - a.y) / (b.x - a.x) AS slope
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.x < b.x),
        |m AS (
        |  SELECT event_type, quantile_cont(slope, 0.5) AS slope,
        |    count(*) AS n_pairs
        |  FROM slopes GROUP BY 1)
        |SELECT d.event_type, count(*) AS n_days,
        |  CAST(any_value(m.n_pairs) AS BIGINT) AS n_pairs,
        |  round(any_value(m.slope), 6) AS slope,
        |  round(quantile_cont(d.y - m.slope * d.x, 0.5), 6) AS intercept
        |FROM daily d JOIN m USING (event_type)
        |GROUP BY 1""".stripMargin),
  )

  def all: Seq[Q] = Seq(q, mad, lift, ab, theilsen)
}
