package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dunning log-likelihood-ratio collocations (Dunning 1993) — the
  * SIGNIFICANCE-ranked companion to `t_pmi_collocations`: PMI's ratio
  * explodes on rare pairs (two hapaxes co-occurring once score
  * maximal); G² weighs the evidence, so "strong but attested" pairs
  * rank above "perfect but once". G² = 2·Σ k·ln(k·N/(R·C)) over the
  * 2×2 contingency table of each bigram — exact integer cells, four
  * ln() terms per pair dsum'd at 9 dp (the t_char_entropy log
  * discipline), zero-cells contributing zero by convention.
  *
  * Same shape as PMI: one bigram agg + two vocab-bounded margin aggs
  * broadcast back.
  */
object Llr {

  val MinCount = 5

  private def term(k: Column, r: Column, c: Column, n: Column): Column =
    when(k > 0,
      k.cast("double") *
        log((k.cast("double") * n.cast("double")) /
          (r.cast("double") * c.cast("double"))))
      .otherwise(0.0)

  private val q = Q(
    "t_llr_collocations",
    (s, d) => {
      val words = split(col("text"), " ")
      val bg = Tables(s, d).documents
        .select(explode(zip_with(
          slice(words, lit(1), size(words) - 1),
          slice(words, lit(2), size(words) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val left = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
      val right = bg.groupBy("w2").agg(count(lit(1)).as("c2"))
      val tot = bg.agg(count(lit(1)).as("n"))
      val cells = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .filter(col("c12") >= MinCount)
        .join(broadcast(left), "w1")
        .join(broadcast(right), "w2")
        .crossJoin(broadcast(tot))
        .withColumn("k11", col("c12"))
        .withColumn("k12", col("c1") - col("c12"))
        .withColumn("k21", col("c2") - col("c12"))
        .withColumn("k22", col("n") - col("c1") - col("c2") + col("c12"))
      val g2raw =
        term(col("k11"), col("c1"), col("c2"), col("n")) +
          term(col("k12"), col("c1"), col("n") - col("c2"), col("n")) +
          term(col("k21"), col("n") - col("c1"), col("c2"), col("n")) +
          term(col("k22"), col("n") - col("c1"), col("n") - col("c2"),
            col("n"))
      // per-pair the 9-dp decimal pass is a plain cast chain (one row,
      // no sum) — identical on both engines, then the display round
      cells.select(col("w1"), col("w2"), col("c12"),
        round((lit(2.0) * g2raw)
          .cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(30, 9)).cast("double"), 4).as("g2"))
    },
    Some {
      def t(k: String, r: String, c: String) =
        s"""CASE WHEN $k > 0 THEN CAST($k AS DOUBLE) *
           |  ln((CAST($k AS DOUBLE) * CAST(n AS DOUBLE))
           |    / (CAST($r AS DOUBLE) * CAST($c AS DOUBLE)))
           |ELSE 0.0 END""".stripMargin
      s"""WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
         |bg AS (
         |  SELECT w[i] AS w1, w[i+1] AS w2
         |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM w)),
         |lft AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
         |rgt AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY w2),
         |tot AS (SELECT count(*) AS n FROM bg),
         |cells AS (
         |  SELECT c.w1, c.w2, c.c12, lft.c1, rgt.c2, tot.n,
         |    c.c12 AS k11, lft.c1 - c.c12 AS k12,
         |    rgt.c2 - c.c12 AS k21,
         |    tot.n - lft.c1 - rgt.c2 + c.c12 AS k22
         |  FROM (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |        FROM bg GROUP BY 1, 2) c
         |  JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN tot
         |  WHERE c.c12 >= $MinCount)
         |SELECT w1, w2, c12,
         |  round(CAST(CAST(2.0 * (
         |    ${t("k11", "c1", "c2")}
         |    + ${t("k12", "c1", "n - c2")}
         |    + ${t("k21", "n - c1", "c2")}
         |    + ${t("k22", "n - c1", "n - c2")}
         |  ) AS DECIMAL(30,9)) AS DOUBLE), 4) AS g2
         |FROM cells""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
