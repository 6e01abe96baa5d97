package graft.operators

import graft.{Q, Tables}
import graft.util.Stable.{dsum, dsumSql}
import org.apache.spark.sql.functions._

/** Tukey's HSD post-hoc pairwise comparison — the step after a
  * significant one-way ANOVA (the repo has Welch/two-way ANOVA rows;
  * this answers the question they raise: WHICH groups differ). For each
  * group pair, the studentized-range statistic
  *
  *   q = |m_i − m_j| / sqrt( MSW/2 · (1/n_i + 1/n_j) )
  *
  * with MSW the pooled within-group mean square. The statistic is
  * emitted, not the verdict: the studentized-range quantile is a
  * caller-side table lookup (same policy as the chi-square and F rows —
  * no libm quantile approximations inside the gate).
  *
  * Exactness: group sums in exact decimal (scale 2, prices are 2-dp);
  * sums of squares at scale 0 (the SCALE CHOICE RULE: x² ≈ 10¹¹ needs
  * the coarse scale for the two engines' double→decimal casts to
  * agree). MSW = (Σx² − Σ_g s_g²/n_g) / (N − k) in one deterministic
  * chain of IEEE ops; q rounds to 6 dp. Shape: ONE map-side-combinable
  * aggregate over the fact table, then a k²-row broadcast self-join —
  * nothing after the aggregate scales with data.
  */
object TukeyHsd {

  private val q = Q(
    "a101_tukey_hsd",
    (s, d) => {
      val g = Tables(s, d).orders
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice"), 2).as("sx"),
          dsum(col("o_totalprice") * col("o_totalprice"), 0).as("sxx"))
        .localCheckpoint(false)
      val pooled = g.agg(
        sum(col("n")).as("nn"), count(lit(1)).as("k"),
        graft.util.Stable.dsum(
          col("sxx") - col("sx") * col("sx") / col("n").cast("double"), 0)
          .as("ssw"))
        .select(col("nn"), col("k"),
          (col("ssw") / (col("nn") - col("k")).cast("double")).as("msw"))
      val a = g.select(col("o_orderpriority").as("g1"),
        col("n").as("n1"), (col("sx") / col("n").cast("double")).as("m1"))
      val b = g.select(col("o_orderpriority").as("g2"),
        col("n").as("n2"), (col("sx") / col("n").cast("double")).as("m2"))
      a.join(b, col("g1") < col("g2"))
        .crossJoin(broadcast(pooled))
        .select(col("g1"), col("g2"),
          round(col("m1") - col("m2"), 6).as("mean_diff"),
          round(abs(col("m1") - col("m2")) /
            sqrt(col("msw") / lit(2.0) *
              (lit(1.0) / col("n1").cast("double") +
                lit(1.0) / col("n2").cast("double"))), 6).as("q_stat"))
    },
    Some(
      s"""WITH g AS (
         |  SELECT o_orderpriority, count(*) AS n,
         |    ${dsumSql("o_totalprice", 2)} AS sx,
         |    ${dsumSql("o_totalprice * o_totalprice", 0)} AS sxx
         |  FROM orders GROUP BY 1),
         |pooled AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k,
         |    ${dsumSql("sxx - sx * sx / CAST(n AS DOUBLE)", 0)} AS ssw
         |  FROM g),
         |msw AS (
         |  SELECT ssw / CAST(nn - k AS DOUBLE) AS msw FROM pooled)
         |SELECT a.o_orderpriority AS g1, b.o_orderpriority AS g2,
         |  round(a.sx / CAST(a.n AS DOUBLE) - b.sx / CAST(b.n AS DOUBLE), 6)
         |    AS mean_diff,
         |  round(abs(a.sx / CAST(a.n AS DOUBLE) - b.sx / CAST(b.n AS DOUBLE))
         |    / sqrt(msw.msw / 2.0 *
         |        (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE))), 6)
         |    AS q_stat
         |FROM g a JOIN g b ON a.o_orderpriority < b.o_orderpriority
         |CROSS JOIN msw""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
