package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema drift audit — the contract check that runs BEFORE
  * `s15_schema_evolution` merges anything: diff two dataset schemas as
  * DATA (added / removed / type-changed columns), so a producer pushing
  * a breaking change is caught at the manifest, not three jobs
  * downstream when a cast fails. Schemas are metadata — the audit reads
  * ZERO data rows (both inputs stay unexecuted plans); the result is a
  * driver-built frame the same way the policy compiler (p16) treats
  * governance rules as data.
  *
  * Ordering discipline: output is sorted by column name in the FRAME
  * construction, so the audit is deterministic regardless of schema
  * field order — field REORDERING is deliberately not drift (columnar
  * formats address by name).
  */
object SchemaDrift {

  /** (column, change, type_a, type_b) for every drifted column. */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    val at = a.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val bt = b.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val rows = (at.keySet ++ bt.keySet).toSeq.sorted.flatMap { c =>
      (at.get(c), bt.get(c)) match {
        case (Some(x), None) => Some((c, "removed", x, null: String))
        case (None, Some(y)) => Some((c, "added", null: String, y))
        case (Some(x), Some(y)) if x != y =>
          Some((c, "type_changed", x, y))
        case _ => None
      }
    }
    val spark = a.sparkSession
    import spark.implicits._
    rows.toDF("column", "change", "type_a", "type_b")
  }

  private val q = Q(
    "s30_schema_drift",
    (s, d) => {
      val v1 = Tables(s, d).orders
      // a producer's next version: drops priority, adds a discount
      // column, narrows the customer key
      val v2 = v1.drop("o_orderpriority")
        .withColumn("o_discount", lit(0.05d))
        .withColumn("o_custkey", col("o_custkey").cast("int"))
      diff(v1, v2)
    },
    // the drift set is fixed by construction — an independent VALUES
    // oracle, the s6_xlsx pattern
    Some(
      """SELECT * FROM (VALUES
        |  ('o_custkey', 'type_changed', 'bigint', 'int'),
        |  ('o_discount', 'added', CAST(NULL AS VARCHAR), 'double'),
        |  ('o_orderpriority', 'removed', 'string', CAST(NULL AS VARCHAR))
        |) AS t("column", change, type_a, type_b)""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
