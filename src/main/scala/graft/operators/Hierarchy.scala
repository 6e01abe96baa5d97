package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Hierarchy closure + subtree rollup — the parent-child aggregation
  * every catalog/org/taxonomy query needs ("total under each node,
  * descendants included") expressed as an ancestor-closure explode +
  * one hash agg, the layout that replaces the recursive CTE a single
  *-node engine would use. The reference's SOC occupation hierarchy
  * (4-digit → 3-digit → 2-digit in `ojd_daps/flows/enrich/labs/soc`)
  * is this exact shape with digit-prefix parents; here the tree is the
  * binary heap order on part keys (parent(k) = k div 2, root 1), so
  * ancestry is PURE ARITHMETIC — node k's depth-j ancestor is k >> j —
  * and both engines derive the identical closure with zero joins.
  *
  * Scale: the closure explode is ×depth (log₂ n ≤ ~40 rows per node —
  * for a prefix/digit hierarchy it's the code length), followed by one
  * map-side-combinable agg on the ancestor key; nothing iterative,
  * nothing driver-side. Subtree money stays exact DECIMAL end-to-end.
  */
object Hierarchy {

  /** Covers trees up to 2^40 nodes; shiftright past the root yields 0
    * and is filtered, so the constant only caps the explode width.
    */
  val MaxDepth = 40

  private val q = Q(
    "j24_hierarchy_rollup",
    (s, d) => {
      val closure = Tables(s, d).part
        .select(col("p_partkey"), col("p_retailprice"))
        .select(col("p_partkey"), col("p_retailprice"),
          explode(sequence(lit(0), lit(MaxDepth))).as("j"))
        .select(expr("shiftright(p_partkey, cast(j AS INT))").as("anc"),
          col("p_retailprice"))
        .filter(col("anc") >= 1)
      // the table stores money as double; the per-addend decimal cast
      // makes the rollup order-free (Stable.dsum discipline)
      closure.groupBy(col("anc").as("p_partkey"))
        .agg(count(lit(1)).as("n_subtree"),
          sum(col("p_retailprice")
            .cast(org.apache.spark.sql.types.DataTypes
              .createDecimalType(12, 2)))
            .cast("double").as("subtree_retail"))
    },
    Some(
      s"""WITH closure AS (
         |  SELECT p_partkey >> j.j AS anc, p_retailprice
         |  FROM part
         |  CROSS JOIN (SELECT unnest(generate_series(0, $MaxDepth)) AS j) j
         |  WHERE p_partkey >> j.j >= 1)
         |SELECT anc AS p_partkey, count(*) AS n_subtree,
         |  CAST(sum(CAST(p_retailprice AS DECIMAL(12,2)))
         |    AS DOUBLE) AS subtree_retail
         |FROM closure GROUP BY 1""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
