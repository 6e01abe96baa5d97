package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** American Soundex phonetic codes — the blocking key classic record
  * linkage pairs with the graded matchers (`j13` edit distance, `j25`
  * Jaro–Winkler, `j15` Fellegi–Sunter): names that SOUND alike share a
  * code, so the candidate space shrinks to phonetic blocks before any
  * expensive verify. Expressed RELATIONALLY — letters explode with
  * positions, the h/w-transparent "previous consonant code" is one
  * IGNORE-NULLS window, emission is a filter, assembly a group — so
  * the identical algorithm runs on both engines with no procedural
  * loop, and at scale it is a per-word window over word length.
  *
  * Rules (NARA variant): keep the first letter; consonants code
  * BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6; vowels AEIOUY separate
  * (reset adjacency), H/W are transparent (the codes on both sides
  * see each other); adjacent equal codes collapse; pad/truncate to 4.
  */
object Soundex {

  /** Shared SQL CASE for the letter → code map (-1 = h/w transparent,
    * 0 = vowel separator).
    */
  private val CodeCase =
    """CASE
      |  WHEN ch IN ('b','f','p','v') THEN 1
      |  WHEN ch IN ('c','g','j','k','q','s','x','z') THEN 2
      |  WHEN ch IN ('d','t') THEN 3
      |  WHEN ch = 'l' THEN 4
      |  WHEN ch IN ('m','n') THEN 5
      |  WHEN ch = 'r' THEN 6
      |  WHEN ch IN ('h','w') THEN -1
      |  ELSE 0 END""".stripMargin

  private val q = Q(
    "f19_soundex_blocking",
    (s, d) => {
      val words = Tables(s, d).part
        .select(explode(split(lower(col("p_name")), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .distinct()
      val letters = words
        .select(col("word"),
          posexplode(split(col("word"), "")).as(Seq("pos", "ch")))
        .filter(col("ch") =!= "")
        .withColumn("code", expr(CodeCase))
      val w = Window.partitionBy("word").orderBy("pos")
      val prevCode = last(when(col("code") =!= -1, col("code")),
          ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
      val emitted = letters
        .withColumn("prev", prevCode)
        .filter(col("pos") > 0 && col("code") >= 1 &&
          (col("prev").isNull || col("prev") =!= col("code")))
      val codes = emitted.groupBy("word")
        .agg(concat_ws("", transform(
          sort_array(collect_list(struct(col("pos"), col("code")))),
          x => x.getField("code"))).as("digits"))
      words.join(codes, Seq("word"), "left")
        .select(col("word"),
          concat(upper(substring(col("word"), 1, 1)),
            rpad(substring(coalesce(col("digits"), lit("")), 1, 3),
              3, "0")).as("soundex"))
    },
    Some(
      s"""WITH words AS (
         |  SELECT DISTINCT word FROM (
         |    SELECT unnest(string_split(lower(p_name), ' ')) AS word
         |    FROM part)
         |  WHERE regexp_full_match(word, '[a-z]+')),
         |letters AS (
         |  SELECT word, p.pos AS pos, p.ch AS ch
         |  FROM (
         |    SELECT word,
         |      unnest(list_transform(string_split(word, ''),
         |        (c, i) -> struct_pack(pos := i, ch := c))) AS p
         |    FROM words)),
         |coded AS (
         |  SELECT word, pos, $CodeCase AS code FROM letters),
         |ctx AS (
         |  SELECT word, pos, code,
         |    last_value(CASE WHEN code <> -1 THEN code END IGNORE NULLS)
         |      OVER (PARTITION BY word ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS prev
         |  FROM coded),
         |emitted AS (
         |  SELECT word, pos, code FROM ctx
         |  WHERE pos > 1 AND code >= 1
         |    AND (prev IS NULL OR prev <> code)),
         |codes AS (
         |  SELECT word, string_agg(CAST(code AS VARCHAR), ''
         |    ORDER BY pos) AS digits
         |  FROM emitted GROUP BY 1)
         |SELECT words.word,
         |  upper(substr(words.word, 1, 1)) ||
         |    rpad(substr(coalesce(codes.digits, ''), 1, 3), 3, '0')
         |    AS soundex
         |FROM words LEFT JOIN codes ON words.word = codes.word"""
        .stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
