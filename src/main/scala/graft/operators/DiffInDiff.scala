package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Difference-in-differences — the third leg of the causal family
  * (a64 post-stratifies, a51 CUPED-adjusts; DiD handles the case
  * where treatment and control differ in LEVEL but share TRENDS):
  * treated = BUILDING-segment customers, the "policy" boundary is the
  * [[CutYear]] year line, outcome is order value in exact cents,
  *
  *   DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre),
  *   SE² = Σ_cells s²/n  (independent-cell normal approx).
  *
  * Exactness: the four cells' (n, Σy, Σy²) are decimal(38,0) sums of
  * cent integers (the a64 overflow guard), the contrast and SE a
  * fixed IEEE chain from them. One fact⋈dim join + one 4-cell
  * aggregate — nothing else touches row count.
  */
object DiffInDiff {

  val CutYear = 1997

  private val q = Q(
    "a72_diff_in_diff",
    (s, d) => {
      val t = Tables(s, d)
      val rows = t.orders
        .join(t.customer.select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(
          (col("c_mktsegment") === "BUILDING").cast("long").as("g"),
          (year(col("o_orderdate")) >= CutYear).cast("long").as("post"),
          round(col("o_totalprice") * 100).cast("long").as("y_c"))
      val cells = rows.groupBy("g", "post").agg(
        count(lit(1)).as("n"),
        sum(col("y_c").cast("decimal(38,0)")).as("sy"),
        sum((col("y_c") * col("y_c")).cast("decimal(38,0)")).as("syy"))
      val aggCols = Seq((1, 1, "t1"), (1, 0, "t0"), (0, 1, "c1"),
        (0, 0, "c0")).flatMap { case (g, p, tag) =>
          Seq(
            max(when(col("g") === g && col("post") === p, col("n")))
              .as(s"n_$tag"),
            max(when(col("g") === g && col("post") === p, col("sy")))
              .as(s"sy_$tag"),
            max(when(col("g") === g && col("post") === p, col("syy")))
              .as(s"syy_$tag"))
        }
      val wide = cells.agg(aggCols.head, aggCols.tail: _*)
      def mean(tag: String) =
        col(s"sy_$tag").cast("double") / col(s"n_$tag").cast("double")
      def varTerm(tag: String) =
        ((col(s"syy_$tag").cast("double") -
          col(s"sy_$tag").cast("double") * col(s"sy_$tag").cast("double") /
            col(s"n_$tag").cast("double")) /
          (col(s"n_$tag") - 1).cast("double")) /
          col(s"n_$tag").cast("double")
      wide.select(
        col("n_t1"), col("n_t0"), col("n_c1"), col("n_c0"),
        round((mean("t1") - mean("t0")) - (mean("c1") - mean("c0")), 4)
          .as("did_cents"),
        round(sqrt(varTerm("t1") + varTerm("t0") + varTerm("c1") +
          varTerm("c0")), 6).as("se_cents"))
    },
    Some(
      s"""WITH rows_ AS (
         |  SELECT
         |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
         |    CASE WHEN EXTRACT(year FROM o_orderdate) >= $CutYear
         |      THEN 1 ELSE 0 END AS post,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS y_c
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |cells AS (
         |  SELECT g, post, count(*) AS n,
         |    sum(CAST(y_c AS DECIMAL(38,0))) AS sy,
         |    sum(CAST(y_c * y_c AS DECIMAL(38,0))) AS syy
         |  FROM rows_ GROUP BY 1, 2),
         |wide AS (
         |  SELECT
         |    max(CASE WHEN g = 1 AND post = 1 THEN n END) AS n_t1,
         |    max(CASE WHEN g = 1 AND post = 1 THEN sy END) AS sy_t1,
         |    max(CASE WHEN g = 1 AND post = 1 THEN syy END) AS syy_t1,
         |    max(CASE WHEN g = 1 AND post = 0 THEN n END) AS n_t0,
         |    max(CASE WHEN g = 1 AND post = 0 THEN sy END) AS sy_t0,
         |    max(CASE WHEN g = 1 AND post = 0 THEN syy END) AS syy_t0,
         |    max(CASE WHEN g = 0 AND post = 1 THEN n END) AS n_c1,
         |    max(CASE WHEN g = 0 AND post = 1 THEN sy END) AS sy_c1,
         |    max(CASE WHEN g = 0 AND post = 1 THEN syy END) AS syy_c1,
         |    max(CASE WHEN g = 0 AND post = 0 THEN n END) AS n_c0,
         |    max(CASE WHEN g = 0 AND post = 0 THEN sy END) AS sy_c0,
         |    max(CASE WHEN g = 0 AND post = 0 THEN syy END) AS syy_c0
         |  FROM cells)
         |SELECT n_t1, n_t0, n_c1, n_c0,
         |  round((CAST(sy_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE)
         |      - CAST(sy_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE))
         |    - (CAST(sy_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE)
         |      - CAST(sy_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE)), 4)
         |    AS did_cents,
         |  round(sqrt(
         |    ((CAST(syy_t1 AS DOUBLE) - CAST(sy_t1 AS DOUBLE)
         |        * CAST(sy_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE))
         |      / CAST(n_t1 - 1 AS DOUBLE)) / CAST(n_t1 AS DOUBLE)
         |    + ((CAST(syy_t0 AS DOUBLE) - CAST(sy_t0 AS DOUBLE)
         |        * CAST(sy_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE))
         |      / CAST(n_t0 - 1 AS DOUBLE)) / CAST(n_t0 AS DOUBLE)
         |    + ((CAST(syy_c1 AS DOUBLE) - CAST(sy_c1 AS DOUBLE)
         |        * CAST(sy_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE))
         |      / CAST(n_c1 - 1 AS DOUBLE)) / CAST(n_c1 AS DOUBLE)
         |    + ((CAST(syy_c0 AS DOUBLE) - CAST(sy_c0 AS DOUBLE)
         |        * CAST(sy_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE))
         |      / CAST(n_c0 - 1 AS DOUBLE)) / CAST(n_c0 AS DOUBLE)), 6)
         |    AS se_cents
         |FROM wide""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
