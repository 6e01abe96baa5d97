package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization — map every group's empirical distribution
  * onto the POOLED distribution (the bioinformatics/feature-prep
  * classic: after mapping, each group's values follow the same
  * reference distribution, so cross-group comparisons stop being
  * confounded by per-group scale). For a cell at within-group
  * cumulative rank r of n_g, the target is the pooled order statistic
  * at position ⌈r·N/n_g⌉ — exact integer position arithmetic, no
  * interpolation float.
  *
  * The inverse-CDF lookup is a MERGE, not a range join: probe cells
  * (position p) and pooled count-table rows (coverage end cum) union
  * onto one integer axis, one forward-looking window picks the first
  * reference at-or-after each probe. The pooled refs REPLICATE per
  * group (|groups| × the count table — bounded) so the merge window
  * partitions by group and parallelises like every other per-group
  * count-table window (the [[graft.util.OrderStats]] discipline — a
  * global unpartitioned window would serialise the merge at scale).
  * Applying the emitted mapping to the fact table is a plain hash
  * join on (group, value).
  */
object QuantileNormalize {

  /** Mapping table for a (grp, v) frame — grp's distribution onto the
    * pooled one.
    */
  def normalize(o: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val cells = o.groupBy("grp", "v").agg(count(lit(1)).as("c"))
      val wg = Window.partitionBy("grp").orderBy("v")
      val ranked = cells.withColumn("r",
        sum(col("c")).over(wg.rowsBetween(Window.unboundedPreceding, 0)))
      val ng = cells.groupBy("grp").agg(sum(col("c")).as("n_g"))
      val nAll = o.agg(count(lit(1)).as("n"))
      val probes = ranked.join(broadcast(ng), "grp")
        .crossJoin(broadcast(nAll))
        .select(expr("(r * n + n_g - 1) div n_g").as("k"),
          lit(0).as("is_ref"), col("grp"), col("v"), col("c"),
          lit(null).cast(o.schema("v").dataType).as("ref_v"))
      val wp = Window.orderBy("v")
      val refs = o.groupBy("v").agg(count(lit(1)).as("cp"))
        .withColumn("k",
          sum(col("cp")).over(wp.rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(ng.select(col("grp"))))
        .select(col("k"), lit(1).as("is_ref"), col("grp"),
          lit(null).cast(o.schema("v").dataType).as("v"),
          lit(null).cast("long").as("c"), col("v").as("ref_v"))
      // "first ref value at-or-after (k, is_ref)" — expressed as a
      // RUNNING last() over the REVERSED order, never as first() over
      // (CURRENT ROW, UNBOUNDED FOLLOWING): Spark's
      // UnboundedFollowingWindowFunctionFrame re-scans the remaining
      // frame for every row — O(rows²) per partition — and at sf0.1
      // (~180k merge rows per group: near-unique prices) that single
      // window was a 20+ minute single-core stall. The reversed running
      // frame is the incremental UnboundedPreceding evaluator: O(rows),
      // identical output (last non-null below in DESC order = first
      // non-null at-or-after in ASC order).
      val wm = Window.partitionBy("grp")
        .orderBy(col("k").desc, col("is_ref").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      probes.unionByName(refs)
        .withColumn("target", last(col("ref_v"), ignoreNulls = true)
          .over(wm))
        .filter(col("is_ref") === 0)
        .select(col("grp"), col("v").as("src_value"), col("c").as("n"),
          col("target"))
  }

  private val q = Q(
    "a61_quantile_normalize",
    (s, d) => normalize(Tables(s, d).orders.select(
      col("o_orderpriority").as("grp"),
      col("o_totalprice").as("v"))),
    Some(
      """WITH o AS (
        |  SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders),
        |cells AS (SELECT grp, v, count(*) AS c FROM o GROUP BY 1, 2),
        |ranked AS (
        |  SELECT grp, v, c,
        |    CAST(sum(c) OVER (PARTITION BY grp ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS r
        |  FROM cells),
        |ng AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_g
        |       FROM cells GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM o),
        |probes AS (
        |  SELECT (r.r * n.n + g.n_g - 1) // g.n_g AS k, 0 AS is_ref,
        |    r.grp, r.v, r.c, NULL AS ref_v
        |  FROM ranked r JOIN ng g USING (grp) CROSS JOIN n),
        |refs0 AS (
        |  SELECT CAST(sum(count(*)) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS k,
        |    1 AS is_ref, v AS ref_v
        |  FROM o GROUP BY v),
        |refs AS (
        |  SELECT r.k, r.is_ref, g.grp, NULL AS v, NULL AS c, r.ref_v
        |  FROM refs0 r CROSS JOIN (SELECT DISTINCT grp FROM cells) g),
        |merged AS (
        |  SELECT *, first_value(CASE WHEN is_ref = 1 THEN ref_v END
        |      IGNORE NULLS)
        |    OVER (PARTITION BY grp ORDER BY k, is_ref
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS target
        |  FROM (SELECT * FROM probes UNION ALL SELECT * FROM refs))
        |SELECT grp, v AS src_value, CAST(c AS BIGINT) AS n, target
        |FROM merged WHERE is_ref = 0""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
