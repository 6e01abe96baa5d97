package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
      val sums = Cols.zipWithIndex.map { case (c, i) =>
        sum(col(c).cast(DecimalType(30, 2))).cast("double").as(s"s$i") }
      val cross = pairs.map { case (i, j) =>
        sum((col(Cols(i)) * col(Cols(j))).cast(DecimalType(30, 4)))
          .cast("double").as(s"s${i}_$j") }
      val m = Tables(s, d).lineitem
        .agg(count(lit(1)).as("n"), (sums ++ cross): _*)
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
