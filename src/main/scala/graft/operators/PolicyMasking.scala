package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Policy-driven column masking — the governance layer that turns a
  * declarative policy TABLE into a projection, instead of hand-written
  * per-dataset masking jobs. `p14` showed one fixed pseudonymization;
  * this generalises it: the policy is DATA (column → action), the
  * engine compiles it into a single codegen projection at plan time, and
  * every release path shares the one implementation of each action.
  *
  * Actions (the standard governance set):
  *   - `keep`            — pass through
  *   - `hash`            — keyed md5 surrogate, 16 hex chars (joinable,
  *                         unlinkable without the pepper; p14 semantics)
  *   - `band:<width>`    — floor to a numeric band (generalisation, the
  *                         k-anonymity move from p11)
  *   - `null`            — suppress entirely
  *
  * The policy is collected (it is governance metadata, tens of rows) and
  * compiled driver-side into Columns — the masked scan itself is one
  * map-only codegen stage, zero shuffle, and composes with pushdown:
  * Catalyst still prunes/pushes through the projection for `keep`
  * columns. Unlisted columns are DROPPED, not kept — fail-closed is the
  * only safe default for a release path.
  */
object PolicyMasking {

  val Pepper = "graft-pepper-v1:"

  /** Compile a policy frame (column, action) against `df`. */
  def applyPolicy(df: DataFrame, policy: DataFrame): DataFrame = {
    val rules = policy.select("column", "action").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val cols: Seq[Column] = rules.toSeq.flatMap { case (name, action) =>
      action match {
        case "keep" => Some(col(name))
        case "hash" => Some(substring(
          md5(concat(lit(Pepper), col(name).cast("string"))), 1, 16)
          .as(name))
        case "null" => Some(lit(null).cast(df.schema(name).dataType)
          .as(name))
        case b if b.startsWith("band:") =>
          val w = b.stripPrefix("band:").toDouble
          Some((floor(col(name) / w) * w).as(name))
        case other => throw new IllegalArgumentException(
          s"unknown masking action '$other' for column '$name'")
      }
    }
    df.select(cols: _*)
  }

  private val q = Q(
    "p16_policy_masking",
    (s, d) => {
      import s.implicits._
      val policy = Seq(
        ("c_custkey", "keep"),
        ("c_name", "hash"),
        ("c_acctbal", "band:1000"),
        ("c_mktsegment", "keep"),
        // c_nationkey unlisted → dropped (fail-closed)
      ).toDF("column", "action")
      applyPolicy(Tables(s, d).customer, policy)
    },
    Some(
      s"""SELECT c_custkey,
         |  substring(md5('$Pepper' || CAST(c_name AS VARCHAR)), 1, 16)
         |    AS c_name,
         |  floor(c_acctbal / 1000.0) * 1000.0 AS c_acctbal,
         |  c_mktsegment
         |FROM customer""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
