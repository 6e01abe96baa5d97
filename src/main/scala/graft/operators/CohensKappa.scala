package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Cohen's kappa — chance-corrected agreement between two raters,
  * here the data-quality audit question "do two independent quality
  * heuristics agree on a document beyond what their marginal label
  * rates force". Rater A buckets by raw length (n_chars), rater B by
  * whitespace token count; both emit {short, mid, long}.
  *
  * EXACT: with confusion counts n_ij, diagonal D = Σ n_ii and
  * chance mass E = Σ_i r_i·c_i,
  *
  *   κ = (N·D − E) / (N² − E)
  *
  * is a ratio of BIGINTs, published as exact ppm via integer `div`
  * alongside the observed/expected agreement ppm. No doubles
  * anywhere.
  *
  * Shape: ONE pass over the corpus builds the 3×3 confusion table;
  * margins and κ are arithmetic over ≤9 rows. At 100 TB the
  * confusion agg is map-side combinable with a 9-row result — the
  * whole statistic costs one scan.
  */
object CohensKappa {

  private val Ppm = 1000000L

  private def bucketA = when(col("n_chars") < 200, "short")
    .when(col("n_chars") < 1000, "mid").otherwise("long")

  private def bucketB = {
    val toks = size(split(trim(col("text")), "\\s+"))
    when(toks < 40, "short").when(toks < 200, "mid").otherwise("long")
  }

  private val q = Q(
    "a75_cohens_kappa",
    (s, d) => {
      val conf = Tables(s, d).documents
        .select(bucketA.as("a"), bucketB.as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
      val ra = conf.groupBy("a").agg(sum(col("c")).as("r"))
      val cb = conf.groupBy("b").agg(sum(col("c")).as("cc"))
      val e = ra.join(cb, col("a") === col("b"))
        .agg(sum(col("r") * col("cc")).as("e"))
      val dn = conf.agg(sum(col("c")).as("n"),
        sum(when(col("a") === col("b"), col("c")).otherwise(0L))
          .as("diag"))
      dn.crossJoin(broadcast(e))
        .select(col("n"), col("diag"), col("e"),
          expr(s"($Ppm * diag) div n").as("po_ppm"),
          expr(s"($Ppm * e) div (n * n)").as("pe_ppm"),
          expr(s"($Ppm * (n * diag - e)) div (n * n - e)")
            .as("kappa_ppm"))
    },
    Some(
      s"""WITH lab AS (
         |  SELECT
         |    CASE WHEN n_chars < 200 THEN 'short'
         |         WHEN n_chars < 1000 THEN 'mid' ELSE 'long' END AS a,
         |    CASE WHEN len(string_split_regex(trim(text), '\\s+')) < 40
         |           THEN 'short'
         |         WHEN len(string_split_regex(trim(text), '\\s+')) < 200
         |           THEN 'mid' ELSE 'long' END AS b
         |  FROM documents),
         |conf AS (SELECT a, b, count(*) AS c FROM lab GROUP BY 1, 2),
         |ra AS (SELECT a, CAST(sum(c) AS BIGINT) AS r FROM conf
         |  GROUP BY 1),
         |cb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cc FROM conf
         |  GROUP BY 1),
         |e AS (SELECT CAST(sum(r * cc) AS BIGINT) AS e
         |  FROM ra JOIN cb ON ra.a = cb.b),
         |dn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
         |      AS diag
         |  FROM conf)
         |SELECT n, diag, e,
         |  ($Ppm * diag) // n AS po_ppm,
         |  ($Ppm * e) // (n * n) AS pe_ppm,
         |  ($Ppm * (n * diag - e)) // (n * n - e) AS kappa_ppm
         |FROM dn CROSS JOIN e""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
