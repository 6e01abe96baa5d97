package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Allen's interval algebra (Allen 1983) — classify each validity
  * interval against its successor into the canonical relations
  * (precedes / meets / overlaps / starts / during / finishes /
  * equals), the vocabulary every temporal-reasoning pipeline speaks.
  * The pairwise machinery exists (`j20` finds overlapping pairs); this
  * NAMES the relationship, per customer, for consecutive order
  * windows — one lead() window, zero joins, and the taxonomy is a
  * single deterministic CASE over four endpoint comparisons.
  */
object AllenRelations {

  val SpanDays = 30

  private val q = Q(
    "j27_allen_relations",
    (s, d) => {
      val iv = Tables(s, d).orders.select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").as("s1"),
        date_add(col("o_orderdate"), SpanDays).as("e1"))
      val w = Window.partitionBy("o_custkey")
        .orderBy("s1", "e1", "o_orderkey")
      val paired = iv
        .withColumn("s2", lead(col("s1"), 1).over(w))
        .withColumn("e2", lead(col("e1"), 1).over(w))
        .filter(col("s2").isNotNull)
      // with s1 <= s2 guaranteed by the ordering, 7 of Allen's 13
      // relations can occur; the CASE is total over them
      val rel = when(col("e1") < col("s2"), "precedes")
        .when(col("e1") === col("s2"), "meets")
        .when(col("s1") === col("s2") && col("e1") === col("e2"), "equals")
        .when(col("s1") === col("s2") && col("e1") < col("e2"), "starts")
        .when(col("s1") === col("s2"), "started_by")
        .when(col("e1") === col("e2"), "finished_by")
        .when(col("e1") > col("e2"), "contains")
        .otherwise("overlaps")
      paired.select(col("o_custkey"), rel.as("relation"))
        .groupBy("relation").agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("o_custkey")).as("n_customers"))
    },
    Some(
      s"""WITH iv AS (
         |  SELECT o_custkey, o_orderkey, o_orderdate AS s1,
         |    o_orderdate + INTERVAL $SpanDays DAY AS e1
         |  FROM orders),
         |paired AS (
         |  SELECT o_custkey, s1, e1,
         |    lead(s1) OVER w AS s2, lead(e1) OVER w AS e2
         |  FROM iv
         |  WINDOW w AS (PARTITION BY o_custkey
         |               ORDER BY s1, e1, o_orderkey)),
         |rel AS (
         |  SELECT o_custkey,
         |    CASE WHEN e1 < s2 THEN 'precedes'
         |         WHEN e1 = s2 THEN 'meets'
         |         WHEN s1 = s2 AND e1 = e2 THEN 'equals'
         |         WHEN s1 = s2 AND e1 < e2 THEN 'starts'
         |         WHEN s1 = s2 THEN 'started_by'
         |         WHEN e1 = e2 THEN 'finished_by'
         |         WHEN e1 > e2 THEN 'contains'
         |         ELSE 'overlaps' END AS relation
         |  FROM paired WHERE s2 IS NOT NULL)
         |SELECT relation, count(*) AS n_pairs,
         |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
         |FROM rel GROUP BY 1""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
