package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental JOIN maintenance — the delta-algebra counterpart of
  * `s18_incremental_agg_maintenance`, closing the materialized-view
  * story for two-sided views.
  *
  * For a view J = A ⋈ B with incoming deltas ΔA, ΔB, the maintained
  * view is
  *
  *     J' = J ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * (insert-only deltas; deletions are the same algebra over an anti
  * join). The point at 100 TB: J (the A ⋈ B term) is yesterday's
  * materialization and is *read, never recomputed*; the three delta
  * terms each have a small side, so they plan as broadcast joins —
  * maintenance cost is O(|ΔA| + |ΔB|), independent of |A ⋈ B|. Here
  * the base term is computed inline (there is no yesterday on a test
  * table), but the three delta joins carry explicit `broadcast()`
  * hints exactly as the maintenance job would.
  *
  * The oracle is a plain full join + GROUP BY: the delta decomposition
  * must be algebraically invisible in the result. That only holds if
  * (A, ΔA) and (B, ΔB) are true partitions of the base tables —
  * disjoint and covering — which the key-mod splits guarantee.
  *
  * Reference anchor: the reference re-runs its whole join DAG per
  * weekly batch (luigi re-executes `enrich` flows end-to-end); delta
  * maintenance is what replaces that rerun once the base stops fitting
  * in a nightly window.
  */
object IncrementalJoin {

  private def maintained(orders: DataFrame, customer: DataFrame)
      : DataFrame = {
    val isDeltaA = col("o_orderkey") % 10 === 0
    val isDeltaB = col("c_custkey") % 7 === 0
    val a  = orders.filter(!isDeltaA)
    val da = orders.filter(isDeltaA)
    val b  = customer.filter(!isDeltaB)
    val db = customer.filter(isDeltaB)
    val on = col("o_custkey") === col("c_custkey")
    val base = a.join(b, on) // yesterday's materialization, read not rebuilt
    val deltas = broadcast(da).join(b, on)
      .unionByName(a.join(broadcast(db), on))
      .unionByName(broadcast(da).join(broadcast(db), on))
    base.unionByName(deltas)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        Stable.dsum(col("o_totalprice")).as("sum_total"))
  }

  private val ivm = Q(
    "s28_incremental_join_maintenance",
    (s, d) => {
      val t = Tables(s, d)
      maintained(t.orders, t.customer)
    },
    Some(
      s"""SELECT c_mktsegment, count(*) AS n,
         |  ${Stable.dsumSql("o_totalprice")} AS sum_total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1""".stripMargin),
  )

  def queries: Seq[Q] = Seq(ivm)
}
