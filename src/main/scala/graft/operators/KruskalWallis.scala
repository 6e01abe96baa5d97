package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Kruskal–Wallis H — the k-group generalisation of `a54`'s rank-sum
  * test (one-way ANOVA on ranks): do the five order priorities draw
  * their values from the same distribution? Pooled DOUBLED tie-ranks
  * (exact BIGINT, the a50/a54 machinery), per-group rank sums squared
  * in DECIMAL(38,0) (a long would overflow at R² ≈ 10²⁰), the 5-term
  * Σ R²/n dsum'd at 6 dp, and the EXACT tie correction
  * C = 1 − Σ(t³−t)/(N³−N) from integer multiplicities — so
  * H/C is one deterministic double chain over exact inputs.
  *
  * Shape: one value agg + one cumulative window over distinct values
  * + value join back + one |groups|-row agg — the count-table layout.
  */
object KruskalWallis {

  private val dec = DecimalType(38, 0)

  private val q = Q(
    "a55_kruskal_wallis",
    (s, d) => {
      val o = Tables(s, d).orders
        .select(col("o_orderpriority").as("g"),
          col("o_totalprice").as("v"))
      val counts = o.groupBy("v").agg(count(lit(1)).as("c"))
      val w = Window.orderBy("v")
      val ranked = counts
        .withColumn("cum", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("v"), col("c"),
          (lit(2L) * (col("cum") - col("c")) + col("c") + 1L).as("r2"))
      val perGroup = o.join(ranked.select("v", "r2"), "v")
        .groupBy("g")
        .agg(count(lit(1)).as("n_j"), sum(col("r2")).as("r2_sum"))
      val ties = counts.agg(
        sum((col("c") * col("c") * col("c") - col("c"))).as("t_sum"),
        sum(col("c")).as("n"))
      // per-group term: (R2_j)² / (4·n_j) — DOUBLED ranks square to 4×
      val agg = perGroup
        .select(col("g"), col("n_j"), col("r2_sum"),
          ((col("r2_sum").cast(dec) * col("r2_sum").cast(dec))
            .cast("double") /
            (lit(4.0) * col("n_j").cast("double"))).as("term"))
        .agg(count(lit(1)).as("k_groups"),
          graft.util.Stable.dsum(col("term"), 6).as("s"))
      agg.crossJoin(broadcast(ties))
        .select(col("k_groups"), col("n"),
          round(lit(12.0) * col("s") /
            (col("n").cast("double") * (col("n") + 1L).cast("double")) -
            lit(3.0) * (col("n") + 1L).cast("double"), 6).as("h"),
          round(lit(1.0) - col("t_sum").cast("double") /
            (col("n") * col("n") * col("n") - col("n")).cast("double"), 9)
            .as("c_ties"))
        .withColumn("h_corrected",
          round(col("h") / col("c_ties"), 6))
    },
    Some(
      s"""WITH o AS (
         |  SELECT o_orderpriority AS g, o_totalprice AS v FROM orders),
         |counts AS (SELECT v, count(*) AS c FROM o GROUP BY 1),
         |ranked AS (
         |  SELECT v, c,
         |    2 * (sum(c) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
         |      + c + 1 AS r2
         |  FROM counts),
         |pg AS (
         |  SELECT o.g, count(*) AS n_j,
         |    CAST(sum(ranked.r2) AS BIGINT) AS r2_sum
         |  FROM o JOIN ranked ON o.v = ranked.v GROUP BY 1),
         |ties AS (
         |  SELECT CAST(sum(c * c * c - c) AS BIGINT) AS t_sum,
         |    CAST(sum(c) AS BIGINT) AS n
         |  FROM counts),
         |agg AS (
         |  SELECT count(*) AS k_groups,
         |    ${graft.util.Stable.dsumSql(
              "CAST(CAST(r2_sum AS HUGEINT) * r2_sum AS DOUBLE)" +
                " / (4.0 * CAST(n_j AS DOUBLE))", 6)} AS s
         |  FROM pg)
         |SELECT agg.k_groups, ties.n,
         |  round(12.0 * agg.s
         |      / (CAST(ties.n AS DOUBLE) * CAST(ties.n + 1 AS DOUBLE))
         |    - 3.0 * CAST(ties.n + 1 AS DOUBLE), 6) AS h,
         |  round(1.0 - CAST(ties.t_sum AS DOUBLE)
         |    / CAST(ties.n * ties.n * ties.n - ties.n AS DOUBLE), 9)
         |    AS c_ties,
         |  round(round(12.0 * agg.s
         |      / (CAST(ties.n AS DOUBLE) * CAST(ties.n + 1 AS DOUBLE))
         |    - 3.0 * CAST(ties.n + 1 AS DOUBLE), 6)
         |    / round(1.0 - CAST(ties.t_sum AS DOUBLE)
         |      / CAST(ties.n * ties.n * ties.n - ties.n AS DOUBLE), 9),
         |    6) AS h_corrected
         |FROM agg CROSS JOIN ties""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
