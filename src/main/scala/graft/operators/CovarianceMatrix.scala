package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Exact covariance matrix — a20's pairwise moments generalised to
  * the full K×K frame a feature-engineering pass hands to PCA /
  * whitening (sim_pca_power consumes exactly this): all K(K+1)/2
  * co-moments of (quantity, extendedprice, discount, tax) in ONE
  * aggregate, emitted in (i, j, cov) long form. Every Σxᵢxⱼ is
  * decimal-exact (2-dp inputs → scale-4 products under the 2^53
  * bound), each covariance one IEEE chain — no per-pair scans, no
  * covar_samp builtin (engine implementations disagree in the last
  * ulp).
  *
  * Shape: ONE map-side-combinable aggregate to a 1-row moment frame,
  * unpivoted to the 10 upper-triangle cells by a constant stack. One
  * scan at any scale, whatever K.
  */
object CovarianceMatrix {

  private val Cols = Seq("l_quantity", "l_extendedprice", "l_discount",
    "l_tax")

  private def covExpr(i: Int, j: Int): String =
    s"round((s${i}_$j - s$i * s$j / CAST(n AS DOUBLE)) " +
      s"/ (CAST(n AS DOUBLE) - 1.0), 6)"

  private val pairs =
    for { i <- Cols.indices; j <- i until Cols.length } yield (i, j)

  private val q = Q(
    "a99_covariance_matrix",
    (s, d) => {
      // Exact fixed-point rewrite (r08, guide §1.2 "per-task work"): the
      // inputs are 2-dp money columns, so every Σx and Σxy the decimal
      // form computed is an exact integer at scale 2 resp. 4 — computed
      // here as cents (v = round(100·x) as long; products v_i·v_j ≤
      // ~1.2e14 fit a long) summed through util.SplitSum's 21-bit limb
      // sums instead of 14 decimal(30+) aggregates whose UnsafeRow
      // byte-buffer updates serialised the scan stage for 4.4 s at
      // sf0.1. Same exact integers → same doubles → same hash; measured
      // 4.47 → 0.61 s full-run bench warm (noop 4.76 → 0.91), cold
      // 4.5 → 2.1 s. The double-rounding in round(100·x) is
      // exact for 2-dp data (error ≪ half-ulp), and v_i·v_j recovers
      // cast(x_i·x_j as decimal(·,4)) exactly (product error ≤ 4e-6 <
      // 5e-5). Overflow-safe to 2^42 rows under ANSI (SplitSum scaladoc).
      import graft.util.SplitSum
      val cents = Tables(s, d).lineitem.select(
        Cols.zipWithIndex.map { case (c, i) =>
          round(col(c) * 100).cast("long").as(s"v$i") }: _*)
      val sumAggs = Cols.indices
        .flatMap(i => SplitSum.sums(col(s"v$i"), s"s$i"))
      val crossAggs = pairs.flatMap { case (i, j) =>
        SplitSum.sums(col(s"v$i") * col(s"v$j"), s"s${i}_$j") }
      val parts = cents.agg(count(lit(1)).as("n"),
        (sumAggs ++ crossAggs): _*)
      val m = parts.select(col("n") +:
        (Cols.indices.map(i => SplitSum.value(s"s$i", 2).as(s"s$i")) ++
          pairs.map { case (i, j) =>
            SplitSum.value(s"s${i}_$j", 4).as(s"s${i}_$j") }): _*)
      val stackArgs = pairs.map { case (i, j) =>
        s"CAST($i AS BIGINT), CAST($j AS BIGINT), ${covExpr(i, j)}"
      }.mkString(", ")
      m.selectExpr(s"stack(${pairs.size}, $stackArgs) AS (i, j, cov)")
    },
    Some {
      val sumSql = Cols.zipWithIndex.map { case (c, i) =>
        s"CAST(sum(CAST($c AS DECIMAL(30,2))) AS DOUBLE) AS s$i" }
      val crossSql = pairs.map { case (i, j) =>
        s"CAST(sum(CAST(${Cols(i)} * ${Cols(j)} AS DECIMAL(30,4))) AS DOUBLE) AS s${i}_$j" }
      val rows = pairs.map { case (i, j) =>
        s"SELECT CAST($i AS BIGINT) AS i, CAST($j AS BIGINT) AS j, ${covExpr(i, j)} AS cov FROM m"
      }.mkString("\n UNION ALL ")
      s"""WITH m AS (
         |  SELECT count(*) AS n,
         |    ${(sumSql ++ crossSql).mkString(",\n    ")}
         |  FROM lineitem)
         |$rows""".stripMargin
    },
  )

  def all: Seq[Q] = Seq(q)
}
