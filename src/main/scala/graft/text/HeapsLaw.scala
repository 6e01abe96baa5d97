package graft.text

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heaps' law fit — vocabulary growth V(N) ≈ K·N^β over ingestion
  * order, the corpus-scaling diagnostic beside [[CorpusShape]]'s Zipf
  * slope: β well below 1 says new data is mostly old words (the
  * diminishing-returns curve [[Novelty]] shows per document, here as
  * one fitted exponent a capacity plan can use).
  *
  * V_b = terms whose FIRST occurrence is at batch ≤ b (one gram-keyed
  * min aggregate + a cumulative count over the |batches| spine —
  * never a per-prefix distinct); N_b = cumulative tokens. β is the
  * OLS slope on (ln N_b, ln V_b) over the spine points. Runtime `ln`
  * IS engine libm — so every ln is rounded to 9 dp before the
  * regression sums (absorbs any cross-libm ulp) and the sums go
  * through [[Stable]] decimals. Scale: the corpus is touched once.
  */
object HeapsLaw {

  val BatchSize = BurstyTerms.BatchSize

  private val q = Q(
    "t_heaps_law",
    (s, d) => {
      val tok = Tables(s, d).documents
        .select(expr(s"doc_id div $BatchSize").as("batch"),
          explode(split(lower(col("text")), " ")).as("term"))
        .filter(length(col("term")) >= 3)
      val w = Window.orderBy("batch")
        .rowsBetween(Window.unboundedPreceding, 0)
      val toks = tok.groupBy("batch").agg(count(lit(1)).as("n"))
        .select(col("batch"), sum(col("n")).over(w).as("n_cum"))
      val vocab = tok.groupBy("term").agg(min(col("batch")).as("b0"))
        .groupBy(col("b0").as("batch")).agg(count(lit(1)).as("v"))
        .select(col("batch"), sum(col("v")).over(w).as("v_cum"))
      val pts = toks.join(vocab, "batch")
        .select(round(log(col("n_cum").cast("double")), 9).as("x"),
          round(log(col("v_cum").cast("double")), 9).as("y"))
      pts.agg(count(lit(1)).as("n_points"),
          Stable.dsum(col("x"), 9).as("sx"),
          Stable.dsum(col("y"), 9).as("sy"),
          Stable.dsum(col("x") * col("x"), 9).as("sxx"),
          Stable.dsum(col("x") * col("y"), 9).as("sxy"))
        .select(col("n_points"),
          round((col("n_points") * col("sxy") - col("sx") * col("sy")) /
            (col("n_points") * col("sxx") - col("sx") * col("sx")), 6)
            .as("beta"),
          round((col("sy") - (col("n_points") * col("sxy") -
            col("sx") * col("sy")) /
            (col("n_points") * col("sxx") - col("sx") * col("sx")) *
            col("sx")) / col("n_points"), 6).as("ln_k"))
    },
    Some(
      s"""WITH tok AS (
         |  SELECT doc_id // $BatchSize AS batch, term
         |  FROM (SELECT doc_id,
         |          unnest(string_split(lower(text), ' ')) AS term
         |        FROM documents)
         |  WHERE length(term) >= 3),
         |toks AS (
         |  SELECT batch,
         |    CAST(sum(n) OVER (ORDER BY batch
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS n_cum
         |  FROM (SELECT batch, count(*) AS n FROM tok GROUP BY 1)),
         |vocab AS (
         |  SELECT batch,
         |    CAST(sum(v) OVER (ORDER BY batch
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS v_cum
         |  FROM (SELECT b0 AS batch, count(*) AS v
         |        FROM (SELECT term, min(batch) AS b0 FROM tok GROUP BY 1)
         |        GROUP BY 1)),
         |pts AS (
         |  SELECT round(ln(CAST(n_cum AS DOUBLE)), 9) AS x,
         |    round(ln(CAST(v_cum AS DOUBLE)), 9) AS y
         |  FROM toks JOIN vocab USING (batch)),
         |s AS (
         |  SELECT count(*) AS n_points,
         |    ${Stable.dsumSql("x", 9)} AS sx,
         |    ${Stable.dsumSql("y", 9)} AS sy,
         |    ${Stable.dsumSql("x * x", 9)} AS sxx,
         |    ${Stable.dsumSql("x * y", 9)} AS sxy
         |  FROM pts)
         |SELECT n_points,
         |  round((n_points * sxy - sx * sy)
         |    / (n_points * sxx - sx * sx), 6) AS beta,
         |  round((sy - (n_points * sxy - sx * sy)
         |    / (n_points * sxx - sx * sx) * sx) / n_points, 6) AS ln_k
         |FROM s""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
