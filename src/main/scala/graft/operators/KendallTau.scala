package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Kendall's τ-b — the third rank-association measure beside a20's
  * Pearson and a50's Spearman, preferred when the data is heavily
  * tied and ordinal. Exact without touching pairs of ROWS: collapse
  * onto the (x, y) value cube first, then concordant/discordant mass
  * is a cube×cube join weighted by cell-count products,
  *
  *   C = Σ n₁n₂ [x₂>x₁ ∧ y₂>y₁],  D = Σ n₁n₂ [x₂>x₁ ∧ y₂<y₁],
  *   τ_b = (C − D) / √((N₀ − Tx)(N₀ − Ty)),
  *
  * with N₀ = n(n−1)/2 and Tx/Ty the tie masses of the marginals. All
  * counts are exact BIGINTs (bounded by n² ≈ 4·10¹³ at sf1 — int64
  * headroom to ~sf100); the one √ and divide are final IEEE ops.
  * Scale: one fact-table cube aggregate; the cube join is
  * |distinct x|·|distinct y| squared — hundreds of cells here,
  * bounded by value cardinality, never rows.
  */
object KendallTau {

  private val q = Q(
    "a67_kendall_tau",
    (s, d) => {
      val base = Tables(s, d).lineitem.select(
        col("l_quantity").cast("long").as("x"),
        round(col("l_discount") * 100).cast("long").as("y"))
      val cube = base.groupBy("x", "y").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val pairs = cube.alias("a").join(broadcast(cube.alias("b")),
        col("b.x") > col("a.x"))
      val cd = pairs.select(
          when(col("b.y") > col("a.y"), col("a.c") * col("b.c"))
            .otherwise(0L).as("conc"),
          when(col("b.y") < col("a.y"), col("a.c") * col("b.c"))
            .otherwise(0L).as("disc"))
        .agg(sum(col("conc")).as("cc"), sum(col("disc")).as("dd"))
      val n = base.agg(count(lit(1)).as("n"))
      val tx = cube.groupBy("x").agg(sum(col("c")).as("m"))
        .agg(sum(expr("m * (m - 1) div 2")).as("tx"))
      val ty = cube.groupBy("y").agg(sum(col("c")).as("m"))
        .agg(sum(expr("m * (m - 1) div 2")).as("ty"))
      cd.crossJoin(broadcast(n)).crossJoin(broadcast(tx))
        .crossJoin(broadcast(ty))
        .select(col("n"), col("cc"), col("dd"), col("tx"), col("ty"),
          round((col("cc") - col("dd")).cast("double") /
            sqrt(expr("n * (n - 1) div 2 - tx").cast("double") *
              expr("n * (n - 1) div 2 - ty").cast("double")), 6)
            .as("tau_b"))
    },
    Some(
      """WITH base AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_discount * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |cube_ AS (SELECT x, y, count(*) AS c FROM base GROUP BY 1, 2),
        |cd AS (
        |  SELECT
        |    CAST(sum(CASE WHEN b.y > a.y THEN a.c * b.c ELSE 0 END)
        |      AS BIGINT) AS cc,
        |    CAST(sum(CASE WHEN b.y < a.y THEN a.c * b.c ELSE 0 END)
        |      AS BIGINT) AS dd
        |  FROM cube_ a JOIN cube_ b ON b.x > a.x),
        |n AS (SELECT count(*) AS n FROM base),
        |tx AS (SELECT CAST(sum(m * (m - 1) // 2) AS BIGINT) AS tx
        |       FROM (SELECT CAST(sum(c) AS BIGINT) AS m
        |             FROM cube_ GROUP BY x)),
        |ty AS (SELECT CAST(sum(m * (m - 1) // 2) AS BIGINT) AS ty
        |       FROM (SELECT CAST(sum(c) AS BIGINT) AS m
        |             FROM cube_ GROUP BY y))
        |SELECT n.n, cd.cc, cd.dd, tx.tx, ty.ty,
        |  round(CAST(cd.cc - cd.dd AS DOUBLE) /
        |    sqrt(CAST(n.n * (n.n - 1) // 2 - tx.tx AS DOUBLE)
        |      * CAST(n.n * (n.n - 1) // 2 - ty.ty AS DOUBLE)), 6)
        |    AS tau_b
        |FROM cd CROSS JOIN n CROSS JOIN tx CROSS JOIN ty""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
