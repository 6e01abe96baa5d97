package graft.text

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._

/** Discrete power-law exponent by MLE (Clauset–Shalizi–Newman) over
  * the token-frequency distribution — the estimator t_zipf_slope's
  * log-log OLS is known to bias (CSN §3: regression on log-binned
  * ranks both biases α and fabricates significance); the MLE with
  * the −½ continuity correction is the field's standard:
  *
  *   α̂ = 1 + n_tail / Σ ln(cᵢ/(c_min − ½)),   SE = (α̂−1)/√n_tail
  *
  * over the tail cᵢ ≥ c_min (c_min = 2 here: singletons are
  * Good–Turing territory, t_good_turing's row). The ln fold is
  * decimal-stable at 9 dp; n_tail and the counts are exact BIGINTs.
  *
  * Shape: the (token) hash agg, then ONE vocab-bounded conditional
  * reduce. One corpus scan at any scale.
  */
object PowerLaw {

  private val CMin = 2L

  private val q = Q(
    "t_powerlaw_alpha",
    (s, d) => {
      val counts = Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      counts
        .agg(count(lit(1)).as("n_vocab"),
          sum(when(col("c") >= CMin, 1L).otherwise(0L)).as("n_tail"),
          Stable.dsum(when(col("c") >= CMin,
            log(col("c").cast("double") / (lit(CMin.toDouble) - 0.5)))
            .otherwise(0.0), 9).as("sln"))
        .selectExpr("n_vocab", "n_tail",
          "round(1.0 + CAST(n_tail AS DOUBLE) / sln, 6) AS alpha",
          "round((CAST(n_tail AS DOUBLE) / sln) / sqrt(CAST(n_tail AS DOUBLE)), 6) AS se")
    },
    Some(
      s"""WITH counts AS (
         |  SELECT tok, count(*) AS c
         |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY 1),
         |red AS (
         |  SELECT count(*) AS n_vocab,
         |    CAST(sum(CASE WHEN c >= $CMin THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_tail,
         |    ${Stable.dsumSql(
             s"CASE WHEN c >= $CMin THEN ln(CAST(c AS DOUBLE) / (CAST($CMin AS DOUBLE) - 0.5)) ELSE 0.0 END", 9)}
         |      AS sln
         |  FROM counts)
         |SELECT n_vocab, n_tail,
         |  round(1.0 + CAST(n_tail AS DOUBLE) / sln, 6) AS alpha,
         |  round((CAST(n_tail AS DOUBLE) / sln) / sqrt(CAST(n_tail AS DOUBLE)), 6) AS se
         |FROM red""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
