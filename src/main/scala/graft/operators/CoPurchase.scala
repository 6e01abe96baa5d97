package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Bipartite co-purchase projection — the market-basket GRAPH beside
  * a32's per-pair lift score: project the order–part bipartite graph
  * onto parts, edge weight = number of orders containing both, and
  * read off the strongest co-purchase edges. This is the
  * collaborative-filtering item graph (and the input a kNN-item
  * recommender would consume).
  *
  * Scale discipline: the pair join is blocked BY ORDER — each order
  * contributes C(|basket|, 2) pairs and TPC-H baskets are ≤7 items,
  * so the fan-out is Σ|basket|², linear in practice and bounded by
  * the basket cap, never |parts|². The top-20 readout is a
  * TakeOrderedAndProject with a full (weight, src, dst) tie-break so
  * the edge list is deterministic.
  */
object CoPurchase {

  private val TopN = 20

  /** Projection over any lineitem-shaped frame — ScaleStress entry. */
  def project(lineitem: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val items = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val pairs = items.alias("a")
      .join(items.alias("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    pairs.groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .orderBy(desc("w"), asc("src"), asc("dst"))
      .limit(TopN)
  }

  private val q = Q(
    "j28_copurchase_projection",
    (s, d) => project(Tables(s, d).lineitem),
    Some(
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         |  FROM lineitem),
         |pairs AS (
         |  SELECT a.pk AS src, b.pk AS dst
         |  FROM items a JOIN items b
         |    ON a.ok = b.ok AND a.pk < b.pk)
         |SELECT src, dst, count(*) AS w
         |FROM pairs GROUP BY 1, 2
         |ORDER BY w DESC, src, dst LIMIT $TopN""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
