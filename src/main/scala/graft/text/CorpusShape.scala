package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shape diagnostics: how concentrated is the corpus across
  * sources, and how Zipfian is its vocabulary — the two summary numbers
  * a mixture designer reads before setting domain weights (a Gini near
  * 1 means a handful of sources dominate and temperature resampling
  * will matter; a Zipf slope far from −1 flags synthetic or degenerate
  * text).
  */
object CorpusShape {

  /** Gini concentration of per-source document counts, exact ppm:
    * G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) over counts sorted ascending.
    * Pure BIGINT algebra; the window runs over |sources| rows (the
    * corpus itself reduces in the groupBy), so the sort is
    * metadata-scale at any corpus size.
    */
  private val gini = Q(
    "t_source_gini",
    (s, d) => {
      val counts = Tables(s, d).documents
        .groupBy("source").agg(count(lit(1)).as("x"))
      val ranked = counts.withColumn("i",
        row_number().over(Window.orderBy(asc("x"), asc("source"))).cast("long"))
      ranked.agg(
        count(lit(1)).as("n_sources"),
        sum(col("x")).as("total_docs"),
        sum(col("i") * col("x")).as("ix"))
        .select(col("n_sources"), col("total_docs"),
          expr("(1000000 * (2 * ix - (n_sources + 1) * total_docs))" +
            " div (n_sources * total_docs)").as("gini_ppm"))
    },
    Some(
      """WITH c AS (SELECT source, count(*) AS x FROM documents
        |           GROUP BY 1),
        |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, source)
        |        AS BIGINT) AS i FROM c)
        |SELECT count(*) AS n_sources, CAST(sum(x) AS BIGINT) AS total_docs,
        |  CAST((1000000 * (2 * sum(i * x) - (count(*) + 1) * sum(x)))
        |    // (count(*) * sum(x)) AS BIGINT) AS gini_ppm
        |FROM r""".stripMargin),
  )

  /** Zipf slope: OLS of ln(freq) on ln(rank) over the top-K vocabulary.
    * Natural text sits near −1; a flat or cliff-shaped fit flags
    * boilerplate or truncated vocabularies. The corpus pass is one
    * token count; the regression runs on K=200 metadata rows with
    * decimal-stable sums, so the only floats are per-row `ln` calls and
    * one final division (4-dp rounded against last-ulp libm skew).
    */
  val ZipfTopK = 200

  private val zipf = Q(
    "t_zipf_slope",
    (s, d) => {
      val freqs = Tables(s, d).documents
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("f"))
        .orderBy(desc("f"), asc("tok")).limit(ZipfTopK)
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("f"), asc("tok"))).cast("long"))
        .select(log(col("rank").cast("double")).as("lx"),
          log(col("f").cast("double")).as("ly"))
      val d9 = (c: org.apache.spark.sql.Column) =>
        graft.util.Stable.dsum(c, 9)
      val stats = freqs.agg(
        count(lit(1)).cast("double").as("n"),
        d9(col("lx")).as("sx"), d9(col("ly")).as("sy"),
        d9(col("lx") * col("lx")).as("sxx"),
        d9(col("lx") * col("ly")).as("sxy"))
      stats.select(col("n").cast("long").as("n_terms"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 4)
          .as("zipf_slope"))
    },
    Some(
      s"""WITH f AS (
         |  SELECT tok, count(*) AS f FROM (
         |    SELECT unnest(string_split(text, ' ')) AS tok
         |    FROM documents) t
         |  WHERE tok <> '' GROUP BY 1
         |  ORDER BY f DESC, tok LIMIT $ZipfTopK),
         |r AS (SELECT ln(CAST(row_number() OVER (ORDER BY f DESC, tok)
         |        AS DOUBLE)) AS lx, ln(CAST(f AS DOUBLE)) AS ly
         |      FROM f),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  ${graft.util.Stable.dsumSql("lx", 9)} AS sx,
         |  ${graft.util.Stable.dsumSql("ly", 9)} AS sy,
         |  ${graft.util.Stable.dsumSql("lx * lx", 9)} AS sxx,
         |  ${graft.util.Stable.dsumSql("lx * ly", 9)} AS sxy
         |  FROM r)
         |SELECT CAST(n AS BIGINT) AS n_terms,
         |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
         |    AS zipf_slope
         |FROM s""".stripMargin),
  )

  /** Per-document character-level Shannon entropy — the gibberish /
    * base64-blob / keyboard-mash detector the word-level quality rules
    * miss (natural language sits ~3.5–4.5 bits/char; hex dumps ~4,
    * base64 ~6, single-char spam ~0). H = log2(n) − (Σ c·log2 c)/n
    * from exact per-char counts; the only floats are per-distinct-char
    * log2 calls summed decimal-stably (≤ alphabet-size terms per doc)
    * and one final rounded expression.
    *
    * Scale: explode + (doc, char) count + doc-keyed agg — two linear
    * map-side-combinable shuffles whose width is bounded by the
    * alphabet, and docs never compare to each other.
    */
  private val entropy = Q(
    "t_char_entropy",
    (s, d) => {
      val counts = Tables(s, d).documents
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "")
        .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      counts.groupBy("doc_id")
        .agg(sum(col("c")).as("n"),
          count(lit(1)).as("n_distinct"),
          graft.util.Stable.dsum(
            col("c").cast("double") * log2(col("c").cast("double")), 9)
            .as("clogc"))
        .select(col("doc_id"), col("n"), col("n_distinct"),
          round(log2(col("n").cast("double")) -
            col("clogc") / col("n").cast("double"), 4).as("entropy_bits"))
    },
    Some(
      s"""WITH ch AS (
         |  SELECT doc_id, unnest(string_split(text, '')) AS ch
         |  FROM documents),
         |cc AS (
         |  SELECT doc_id, ch, count(*) AS c FROM ch
         |  WHERE ch <> '' GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         |  count(*) AS n_distinct,
         |  round(log2(CAST(sum(c) AS DOUBLE)) -
         |    ${graft.util.Stable.dsumSql(
        "CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))", 9)}
         |    / CAST(sum(c) AS DOUBLE), 4) AS entropy_bits
         |FROM cc GROUP BY 1""".stripMargin),
  )

  def queries: Seq[Q] = Seq(gini, zipf, entropy)
}
