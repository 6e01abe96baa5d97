package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Luhn checksum validation (ISO/IEC 7812) — the card-number detector
  * behind PII redaction's hardest case: a 16-digit string is only
  * worth masking if its check digit is CONSISTENT, which cuts the
  * false-positive rate on arbitrary digit runs by 10×. Pure integer
  * digit algebra inside one codegen projection (map-only); emitted
  * masked (last four only), the `p16_policy_masking` discipline.
  *
  * The fixture derives one card per customer arithmetically and
  * corrupts the check digit for odd keys — so exactly the even-key
  * half validates, and the oracle replays the derivation and the
  * validation independently.
  */
object Luhn {

  /** Spark-side digit derivation (mirrored in the oracle SQL). */
  private def digitExpr(i: Int) =
    s"CAST((c_custkey * ${i + 3} + ${i * i * 7 + 11}) % 10 AS INT)"

  private val q = Q(
    "f18_luhn_check",
    (s, d) => {
      val d15 = (0 until 15).map(digitExpr)
      // Luhn over the 15 payload digits with the check digit at
      // position 16: doubling hits 0-based even positions
      val payloadSum = d15.zipWithIndex.map { case (e, i) =>
        if (i % 2 == 0) s"(CASE WHEN 2 * $e > 9 THEN 2 * $e - 9 " +
          s"ELSE 2 * $e END)"
        else e
      }.mkString(" + ")
      val check = s"(10 - ($payloadSum) % 10) % 10"
      val corrupted = s"CASE WHEN c_custkey % 2 = 1 " +
        s"THEN ($check + 5) % 10 ELSE $check END"
      val card = expr("concat(" +
        d15.map(e => s"CAST($e AS STRING)").mkString(", ") +
        s", CAST($corrupted AS STRING))")
      val c = Tables(s, d).customer
        .select(col("c_custkey"), card.as("card"))
      // the VALIDATOR: independent of construction — digits from the
      // string, doubling from the right, total % 10 == 0
      val valid = expr(
        """aggregate(
          |  zip_with(
          |    transform(split(card, ''), x -> CAST(x AS INT)),
          |    sequence(0, 15),
          |    (dg, i) -> CASE WHEN i % 2 = 0 THEN
          |        CASE WHEN 2 * dg > 9 THEN 2 * dg - 9 ELSE 2 * dg END
          |      ELSE dg END),
          |  0, (acc, x) -> acc + x) % 10 = 0""".stripMargin)
      c.select(col("c_custkey"),
        concat(lit("************"), substring(col("card"), 13, 4))
          .as("card_masked"),
        valid.as("luhn_valid"))
    },
    Some {
      val d15 = (0 until 15).map(i =>
        s"CAST((c_custkey * ${i + 3} + ${i * i * 7 + 11}) % 10 AS INT)")
      val payloadSum = d15.zipWithIndex.map { case (e, i) =>
        if (i % 2 == 0) s"(CASE WHEN 2 * $e > 9 THEN 2 * $e - 9 " +
          s"ELSE 2 * $e END)"
        else e
      }.mkString(" + ")
      val check = s"(10 - ($payloadSum) % 10) % 10"
      val corrupted = s"CASE WHEN c_custkey % 2 = 1 " +
        s"THEN ($check + 5) % 10 ELSE $check END"
      val card = d15.map(e => s"CAST($e AS VARCHAR)")
        .mkString("", " || ", s" || CAST($corrupted AS VARCHAR)")
      s"""WITH c AS (SELECT c_custkey, $card AS card FROM customer)
         |SELECT c_custkey,
         |  '************' || substr(card, 13, 4) AS card_masked,
         |  list_sum(list_transform(string_split(card, ''),
         |    (x, i) -> CASE WHEN (i - 1) % 2 = 0 THEN
         |        CASE WHEN 2 * CAST(x AS INT) > 9
         |          THEN 2 * CAST(x AS INT) - 9
         |          ELSE 2 * CAST(x AS INT) END
         |      ELSE CAST(x AS INT) END)) % 10 = 0 AS luhn_valid
         |FROM c""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
