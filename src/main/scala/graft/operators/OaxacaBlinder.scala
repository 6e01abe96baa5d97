package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oaxaca–Blinder decomposition — the econometric staple for "how
  * much of the outcome gap between two groups is EXPLAINED by their
  * different characteristics, and how much is not": here, the
  * order-value gap between BUILDING- and MACHINERY-segment customers
  * decomposed over basket size (line-item count). Two-fold form from
  * group B's viewpoint:
  *
  *   ȳA − ȳB = (x̄A − x̄B)·βB   [explained / endowment]
  *           + x̄A·(βA − βB) + (αA − αB)   [unexplained / structure]
  *
  * Each group's OLS (α, β) comes from the a29 five-moment normal
  * equations — Σx/Σy/Σxy/Σx² exact (counts BIGINT, money decimal) —
  * and the decomposition is a fixed IEEE chain on the 2-row frame.
  *
  * Shape: one orders⋈customer broadcast join, one lineitem count agg
  * joined on the order key, ONE conditional group aggregate to 2
  * rows. Two fact scans (orders, lineitem) at any scale.
  */
object OaxacaBlinder {

  private val SegA = "BUILDING"
  private val SegB = "MACHINERY"

  private val q = Q(
    "a98_oaxaca_blinder",
    (s, d) => {
      val t = Tables(s, d)
      val items = t.lineitem.groupBy("l_orderkey")
        .agg(count(lit(1)).as("x"))
      val base = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin(SegA, SegB))
        .join(items, col("o_orderkey") === col("l_orderkey"))
        .select((col("c_mktsegment") === SegA).as("is_a"),
          col("x").cast("long").as("x"),
          col("o_totalprice").cast(DecimalType(30, 2)).as("y"))
      val g = base.groupBy("is_a")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("y") * col("x")).cast("double").as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("beta", expr(
          "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) " +
            "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"))
        .withColumn("alpha", expr(
          "(sy - beta * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"))
        .withColumn("xbar", expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"))
        .withColumn("ybar", expr("sy / CAST(n AS DOUBLE)"))
      g.groupBy()
        .agg(max(when(col("is_a"), col("xbar"))).as("xa"),
          max(when(!col("is_a"), col("xbar"))).as("xb"),
          max(when(col("is_a"), col("ybar"))).as("ya"),
          max(when(!col("is_a"), col("ybar"))).as("yb"),
          max(when(col("is_a"), col("alpha"))).as("aa"),
          max(when(!col("is_a"), col("alpha"))).as("ab"),
          max(when(col("is_a"), col("beta"))).as("ba"),
          max(when(!col("is_a"), col("beta"))).as("bb"))
        .selectExpr(
          "round(ya - yb, 6) AS gap",
          "round((xa - xb) * bb, 6) AS explained",
          "round(xa * (ba - bb) + (aa - ab), 6) AS unexplained",
          "round(ba, 6) AS beta_a", "round(bb, 6) AS beta_b")
    },
    Some(
      s"""WITH items AS (
         |  SELECT l_orderkey, count(*) AS x FROM lineitem GROUP BY 1),
         |base AS (
         |  SELECT c.c_mktsegment = '$SegA' AS is_a,
         |    CAST(i.x AS BIGINT) AS x,
         |    CAST(o.o_totalprice AS DECIMAL(30,2)) AS y
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN items i ON o.o_orderkey = i.l_orderkey
         |  WHERE c.c_mktsegment IN ('$SegA', '$SegB')),
         |g AS (
         |  SELECT is_a, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(y) AS DOUBLE) AS sy,
         |    CAST(sum(y * x) AS DOUBLE) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM base GROUP BY 1),
         |fit AS (
         |  SELECT *,
         |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta
         |  FROM g),
         |fit2 AS (
         |  SELECT *, (sy - beta * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
         |      AS alpha,
         |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
         |    sy / CAST(n AS DOUBLE) AS ybar
         |  FROM fit),
         |wide AS (
         |  SELECT max(CASE WHEN is_a THEN xbar END) AS xa,
         |    max(CASE WHEN NOT is_a THEN xbar END) AS xb,
         |    max(CASE WHEN is_a THEN ybar END) AS ya,
         |    max(CASE WHEN NOT is_a THEN ybar END) AS yb,
         |    max(CASE WHEN is_a THEN alpha END) AS aa,
         |    max(CASE WHEN NOT is_a THEN alpha END) AS ab,
         |    max(CASE WHEN is_a THEN beta END) AS ba,
         |    max(CASE WHEN NOT is_a THEN beta END) AS bb
         |  FROM fit2)
         |SELECT round(ya - yb, 6) AS gap,
         |  round((xa - xb) * bb, 6) AS explained,
         |  round(xa * (ba - bb) + (aa - ab), 6) AS unexplained,
         |  round(ba, 6) AS beta_a, round(bb, 6) AS beta_b
         |FROM wide""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
