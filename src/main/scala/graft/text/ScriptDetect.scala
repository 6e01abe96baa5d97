package graft.text

import graft.Q
import org.apache.spark.sql.functions._

/** Unicode-script detection — the step BEFORE t_language_id in a
  * multilingual crawl (n-gram language profiles assume you already
  * know the script; CJK vs Cyrillic vs Latin is decided here, by
  * codepoint-range counting, not by n-grams). Counts per script
  * class are `regexp_count` over explicit codepoint ranges — codegen
  * map work in Spark, RE2 in DuckDB, same UTF-8 semantics (the
  * t_fingerprint_fnv_unicode canary pins that contract).
  *
  * The corpus tables are ASCII-only, so the query runs on an inline
  * multilingual fixture with an independent VALUES oracle — the
  * s6/s30 pattern. Dominant script = max count, ties broken by the
  * fixed class order.
  */
object ScriptDetect {

  /** (id, text) fixture: one row per script plus a mixed row. */
  private val fixture: Seq[(Long, String)] = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "съешь ещё этих мягких булок"),
    (3L, "γαζέες και μυρτιές"),
    (4L, "中文处理测试文本"),
    (5L, "latin и кириллица mixed"),
  )

  private val Latin = "[A-Za-z]"
  private val Cyrillic = "[Ѐ-ӿ]"
  private val Greek = "[Ͱ-Ͽ]"
  private val Cjk = "[一-鿿]"

  private def sqlText(t: String): String = "'" + t + "'"

  private val q = Q(
    "t_script_detection",
    (s, d) => {
      import s.implicits._
      fixture.toDF("id", "text")
        .select(col("id"),
          regexp_count(col("text"), lit(Latin)).cast("long").as("n_latin"),
          regexp_count(col("text"), lit(Cyrillic)).cast("long")
            .as("n_cyrillic"),
          regexp_count(col("text"), lit(Greek)).cast("long").as("n_greek"),
          regexp_count(col("text"), lit(Cjk)).cast("long").as("n_cjk"))
        .withColumn("dominant", expr(
          """CASE greatest(n_latin, n_cyrillic, n_greek, n_cjk)
            |  WHEN n_latin THEN 'latin'
            |  WHEN n_cyrillic THEN 'cyrillic'
            |  WHEN n_greek THEN 'greek'
            |  ELSE 'cjk' END""".stripMargin))
    },
    Some {
      val rows = fixture
        .map { case (i, t) => s"($i, ${sqlText(t)})" }.mkString(", ")
      s"""WITH fx(id, text) AS (VALUES $rows),
         |c AS (
         |  SELECT id,
         |    CAST(len(regexp_extract_all(text, '$Latin')) AS BIGINT)
         |      AS n_latin,
         |    CAST(len(regexp_extract_all(text, '$Cyrillic')) AS BIGINT)
         |      AS n_cyrillic,
         |    CAST(len(regexp_extract_all(text, '$Greek')) AS BIGINT)
         |      AS n_greek,
         |    CAST(len(regexp_extract_all(text, '$Cjk')) AS BIGINT)
         |      AS n_cjk
         |  FROM fx)
         |SELECT *,
         |  CASE greatest(n_latin, n_cyrillic, n_greek, n_cjk)
         |    WHEN n_latin THEN 'latin'
         |    WHEN n_cyrillic THEN 'cyrillic'
         |    WHEN n_greek THEN 'greek'
         |    ELSE 'cjk' END AS dominant
         |FROM c""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
