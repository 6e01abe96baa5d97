package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Code-vs-prose signals and URL domain provenance — two curation
  * scans a web-scale training corpus runs before mixing (The
  * Stack/StarCoder filter code by exactly these surface densities;
  * C4's provenance audit is the domain histogram).
  */
object CodeSignals {

  /** Everything is exact integer counts from one map-only projection —
    * brace/semicolon/equals density, indented-line fraction, keyword
    * hits against a broadcast-literal list — plus 6-dp display ratios.
    * The thresholds are declared in the output (is_codey), not hidden
    * in a model, so the gate replays them.
    */
  private val code = Q(
    "t_code_signals",
    (s, d) => {
      val keywords = Seq("def", "return", "import", "class", "void",
        "public", "function", "var", "const", "if", "else")
      val t = col("text")
      val n = length(t)
      val lines = split(t, "\n")
      val nLines = size(lines)
      val braces = n - length(regexp_replace(t, "[{}()\\[\\];=]", ""))
      val indented = size(filter(lines, l => l.startsWith("  ")))
      val words = split(lower(t), "[^a-z_]+")
      val kwHits = size(filter(words,
        w => w.isInCollection(keywords)))
      Tables(s, d).documents.select(col("doc_id"),
          n.cast("long").as("n_chars"),
          nLines.cast("long").as("n_lines"),
          braces.cast("long").as("n_symbols"),
          indented.cast("long").as("n_indented"),
          kwHits.cast("long").as("n_keywords"))
        .filter(col("n_chars") > 0)
        .withColumn("symbol_density",
          round(col("n_symbols").cast("double") /
            col("n_chars").cast("double"), 6))
        .withColumn("is_codey",
          col("n_symbols") * 100L >= col("n_chars") * 3L &&
            col("n_keywords") >= 3L)
    },
    Some {
      val kws = Seq("def", "return", "import", "class", "void",
        "public", "function", "var", "const", "if", "else")
        .map(k => s"'$k'").mkString(", ")
      s"""SELECT doc_id,
         |  CAST(len(text) AS BIGINT) AS n_chars,
         |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         |  CAST(len(text) - len(regexp_replace(text,
         |    '[{}()\\[\\];=]', '', 'g')) AS BIGINT) AS n_symbols,
         |  CAST(len(list_filter(string_split(text, chr(10)),
         |    l -> l LIKE '  %')) AS BIGINT) AS n_indented,
         |  CAST(len(list_filter(string_split_regex(lower(text),
         |    '[^a-z_]+'), w -> w IN ($kws))) AS BIGINT) AS n_keywords,
         |  round(CAST(len(text) - len(regexp_replace(text,
         |      '[{}()\\[\\];=]', '', 'g')) AS DOUBLE)
         |    / CAST(len(text) AS DOUBLE), 6) AS symbol_density,
         |  (len(text) - len(regexp_replace(text, '[{}()\\[\\];=]', '',
         |     'g'))) * 100 >= len(text) * 3
         |    AND len(list_filter(string_split_regex(lower(text),
         |      '[^a-z_]+'), w -> w IN ($kws))) >= 3 AS is_codey
         |FROM documents WHERE len(text) > 0""".stripMargin
    },
  )

  /** URL domain histogram: extract every http(s) URL, reduce to its
    * host, count per domain — the corpus provenance audit (and the
    * input to a domain blocklist join). One extract-explode + one
    * domain-keyed agg, map-side combined. The fixture corpus carries
    * no URLs, so each doc gets a deterministic provenance footer
    * derived from its `source` column first — the EXTRACTION is the
    * operator under test, and docs citing each other (doc_id % 7 = 0
    * adds a second, cross-source link) make the counts non-flat.
    */
  private val domains = Q(
    "t_url_domains",
    (s, d) => {
      val page = concat(col("text"),
        lit(" via https://"), col("source"), lit(".example.org/doc/"),
        col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" see http://Mirror-"), col("doc_id") % 3,
            lit(".archive.net/x"))).otherwise(lit("")))
      val urls = regexp_extract_all(page,
        lit("https?://([A-Za-z0-9.-]+)"), lit(1))
      Tables(s, d).documents
        .select(explode(urls).as("host"))
        .select(lower(col("host")).as("host"))
        .groupBy("host")
        .agg(count(lit(1)).as("n_urls"))
    },
    Some(
      """SELECT lower(host) AS host, count(*) AS n_urls
        |FROM (
        |  SELECT unnest(regexp_extract_all(
        |    text || ' via https://' || source || '.example.org/doc/'
        |      || doc_id ||
        |      CASE WHEN doc_id % 7 = 0 THEN ' see http://Mirror-'
        |        || (doc_id % 3) || '.archive.net/x' ELSE '' END,
        |    'https?://([A-Za-z0-9.-]+)', 1)) AS host
        |  FROM documents)
        |GROUP BY 1""".stripMargin),
  )

  def queries: Seq[Q] = Seq(code, domains)
}
