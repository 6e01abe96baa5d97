package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication entry points (SURVEY.md §2.6 + the LLM-pipeline dedup
  * family). SQL-expressible ones carry DuckDB oracles; the approximate
  * ones (MinHash/SimHash/LSH) are verified by ScalaTest specs instead.
  */
object DedupQueries {

  private val exact = Q(
    "d_exact_dedup_groups",
    (s, d) =>
      // exact dedup: hash-groupBy on content — at 100 TB, group on a
      // fixed-width digest, not the full text (shuffle 16 bytes/row).
      Tables(s, d).documents
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("exemplar")),
    Some(
      """SELECT md5(text) AS content_hash, count(*) AS n_docs,
        |  min(doc_id) AS exemplar
        |FROM documents GROUP BY 1""".stripMargin),
  )

  private val exemplar = Q(
    "d5_exemplar_selection",
    (s, d) => {
      // exemplar = min-id row per duplicate group, rest flagged duplicate
      // (ref dqa/data_getters.py:379-404) — deterministic across partitions.
      val w = Window.partitionBy("content_hash").orderBy(asc("doc_id"))
      Tables(s, d).documents
        .withColumn("content_hash", md5(col("text")))
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"), col("content_hash"),
          (col("rn") > 1).as("is_duplicate"))
    },
    Some(
      """SELECT doc_id, md5(text) AS content_hash,
        |  row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) > 1
        |    AS is_duplicate
        |FROM documents""".stripMargin),
  )

  private val d3 = Q(
    "d3_connected_components",
    (s, d) => {
      // chain edges between suppliers of the same nation → components must
      // equal per-nation min(suppkey); the oracle computes that truth via
      // an independent window expression, validating the iterative
      // large-star/small-star algorithm end-to-end.
      val t = Tables(s, d)
      val w = Window.partitionBy("s_nationkey").orderBy(asc("s_suppkey"))
      val ranked = t.supplier
        .select(col("s_suppkey"), col("s_nationkey"))
        .withColumn("rn", row_number().over(w))
      val edges = ranked.alias("a")
        .join(ranked.alias("b"),
          col("a.s_nationkey") === col("b.s_nationkey") &&
            col("a.rn") === col("b.rn") - 1)
        .select(col("a.s_suppkey").as("src"), col("b.s_suppkey").as("dst"))
      ConnectedComponents.cached(edges,
          nodeSet = Some(t.supplier.select(col("s_suppkey").as("id"))))
        .withColumnRenamed("id", "s_suppkey")
    },
    Some(
      """SELECT s_suppkey,
        |  min(s_suppkey) OVER (PARTITION BY s_nationkey) AS component
        |FROM supplier""".stripMargin),
  )

  private val j10 = Q(
    "j10_subgraph_membership",
    (s, d) => {
      // component ∩ window-membership semi join (ref dqa/data_getters
      // .py:392-404): keep component members whose row falls in a window.
      val t = Tables(s, d)
      val comps = t.supplier
        .select(col("s_suppkey"),
          min(col("s_suppkey"))
            .over(Window.partitionBy("s_nationkey")).as("component"))
      val inWindow = t.lineitem
        .filter(col("l_shipdate").between("1997-01-01", "1997-12-31"))
        .select(col("l_suppkey").as("s_suppkey"))
      comps.join(inWindow, Seq("s_suppkey"), "left_semi")
    },
    Some(
      """SELECT s_suppkey, component FROM (
        |  SELECT s_suppkey,
        |    min(s_suppkey) OVER (PARTITION BY s_nationkey) AS component
        |  FROM supplier)
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
        |    AND TIMESTAMP '1997-12-31 00:00:00')""".stripMargin),
  )

  /** Incremental CC over an edge delta: d3's per-nation supplier chains
    * are the base labelling; the delta links nation n to n+1 for
    * n % 5 == 0 (via each nation's min supplier), merging component
    * pairs. The oracle states the merged truth directly — nations
    * {n, n+1} for n % 5 == 0 share one component, whose id is the pair's
    * min supplier key — so a green row proves incremental == full
    * recompute without the oracle ever simulating the machinery.
    */
  private val d15 = Q(
    "d15_incremental_cc",
    (s, d) => {
      val t = Tables(s, d)
      val w = Window.partitionBy("s_nationkey").orderBy(asc("s_suppkey"))
      val ranked = t.supplier
        .select(col("s_suppkey"), col("s_nationkey"))
        .withColumn("rn", row_number().over(w))
      val baseEdges = ranked.alias("a")
        .join(ranked.alias("b"),
          col("a.s_nationkey") === col("b.s_nationkey") &&
            col("a.rn") === col("b.rn") - 1)
        .select(col("a.s_suppkey").as("src"), col("b.s_suppkey").as("dst"))
      val labels0 = ConnectedComponents.cached(baseEdges,
        nodeSet = Some(t.supplier.select(col("s_suppkey").as("id"))))
      val mins = t.supplier.groupBy("s_nationkey")
        .agg(min(col("s_suppkey")).as("mk"))
      val delta = mins.filter(col("s_nationkey") % 5 === 0).alias("a")
        .join(mins.alias("b"),
          col("b.s_nationkey") === col("a.s_nationkey") + 1)
        .select(col("a.mk").as("src"), col("b.mk").as("dst"))
      ConnectedComponents.incremental(labels0, delta)
        .withColumnRenamed("id", "s_suppkey")
    },
    Some(
      """SELECT s_suppkey,
        |  min(s_suppkey) OVER (PARTITION BY
        |    s_nationkey - CASE WHEN s_nationkey % 5 = 1 THEN 1 ELSE 0 END)
        |  AS component
        |FROM supplier""".stripMargin),
  )

  def all: Seq[Q] = Seq(exact, exemplar, d3, j10, d15) ++
    MinHashDedup.queries ++
    SimHashDedup.queries ++ NgramJaccard.queries ++ DedupClusters.queries ++
    PageRank.queries
}
