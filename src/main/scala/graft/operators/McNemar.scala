package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** McNemar's test — the PAIRED binary companion to a75's kappa:
  * kappa asks "how much do two quality gates agree", McNemar asks
  * "is their disagreement SYMMETRIC" (equivalently: do the two gates
  * pass different fractions of the same corpus — the question that
  * decides whether swapping filter A for filter B shifts the kept
  * set). Only the discordant cells matter:
  *
  *   χ² = (|b − c| − 1)² / (b + c)   (continuity-corrected)
  *
  * with b = A-pass∧B-fail, c = A-fail∧B-pass. EXACT: one BIGINT
  * 2×2 aggregate over the corpus, one final IEEE divide.
  */
object McNemar {

  private val q = Q(
    "a79_mcnemar",
    (s, d) => {
      val lab = Tables(s, d).documents.select(
        (col("n_chars") >= 500).cast("long").as("a"),
        (size(split(trim(col("text")), "\\s+")) >= 100).cast("long")
          .as("b"))
      lab.agg(count(lit(1)).as("n"),
        sum(col("a") * (lit(1L) - col("b"))).as("b_cell"),
        sum((lit(1L) - col("a")) * col("b")).as("c_cell"))
        .select(col("n"), col("b_cell"), col("c_cell"),
          round((abs(col("b_cell") - col("c_cell")) - 1L)
            .cast("double") *
            (abs(col("b_cell") - col("c_cell")) - 1L).cast("double") /
            (col("b_cell") + col("c_cell")).cast("double"), 6)
            .as("chi2_mcnemar"))
    },
    Some(
      """WITH lab AS (
        |  SELECT CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 100
        |      THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |agg AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(a * (1 - b)) AS BIGINT) AS b_cell,
        |    CAST(sum((1 - a) * b) AS BIGINT) AS c_cell
        |  FROM lab)
        |SELECT n, b_cell, c_cell,
        |  round(CAST(abs(b_cell - c_cell) - 1 AS DOUBLE)
        |    * CAST(abs(b_cell - c_cell) - 1 AS DOUBLE)
        |    / CAST(b_cell + c_cell AS DOUBLE), 6) AS chi2_mcnemar
        |FROM agg""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
