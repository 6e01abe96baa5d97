package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed near-dup pipeline an LLM-data curator actually runs:
  * MinHash-LSH pair generation → connected components → min-id exemplar
  * per cluster → duplicate flags. Output covers every doc that appears
  * in at least one verified pair.
  *
  * The oracle replays it exactly: brute-force Jaccard pairs + a
  * recursive-CTE min-label propagation — so the whole composition
  * (approximate candidate gen, exact verify, distributed CC, exemplar
  * rule) is hash-checked end-to-end.
  */
object DedupClusters {

  def clusters(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val pairs = MinHashDedup.nearDupPairs(docs, threshold)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // cached: the dedup graph is the hub of the whole pipeline (cluster
    // read, exemplar pick, snapshot joins all reuse it) — pay the CC
    // loop once per distinct edge set. Explicit key: the LSH pipeline
    // checkpoints its candidate pairs, and an RDD-backed leaf has no
    // stable plan identity — key on the INPUT corpus plan + parameters
    // instead (bump the version tag when nearDupPairs logic changes).
    ConnectedComponents.cached(edges, key = Some(
      s"minhash-clusters-v1|${graft.domain.SharedCache.planKey(docs)}|$threshold"))
      .select(col("id").as("doc_id"), col("component").as("cluster"),
        (col("id") =!= col("component")).as("is_duplicate"))
  }

  private val q = Q(
    "d_dedup_clusters",
    (s, d) => clusters(Tables(s, d).documents, 0.8),
    Some(
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
        |      i -> concat_ws(' ', string_split(text,' ')[i],
        |                          string_split(text,' ')[i+1],
        |                          string_split(text,' ')[i+2]))) AS sh
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |sym AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |walk(id, comp) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.id)
        |SELECT id AS doc_id, min(comp) AS cluster,
        |       id <> min(comp) AS is_duplicate
        |FROM walk GROUP BY id""".stripMargin),
  )

  /** The deliverable the pipeline exists for: the corpus with near-dup
    * clusters collapsed to their exemplar — exemplars and never-matched
    * docs survive, flagged duplicates drop. Anti-join against the cached
    * cluster table, so the CC loop is shared with every other consumer.
    */
  def dedupCorpus(docs: DataFrame, threshold: Double = 0.8): DataFrame =
    docs.join(
      clusters(docs, threshold).filter(col("is_duplicate"))
        .select("doc_id"),
      Seq("doc_id"), "left_anti")

  private val corpusQ = Q(
    "d_dedup_corpus",
    (s, d) => dedupCorpus(Tables(s, d).documents, 0.8)
      .select("doc_id", "n_chars"),
    Some(
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
        |      i -> concat_ws(' ', string_split(text,' ')[i],
        |                          string_split(text,' ')[i+1],
        |                          string_split(text,' ')[i+2]))) AS sh
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |sym AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |walk(id, comp) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.id),
        |dups AS (
        |  SELECT id FROM walk GROUP BY id HAVING id <> min(comp))
        |SELECT doc_id, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM dups)""".stripMargin),
  )

  /** Contrastive training pairs minted from the dedup graph itself:
    * near-duplicate clusters are FREE positive pairs for embedding/
    * retrieval training (two crawls of one page are semantically
    * identical by construction), so the curation pipeline's by-product
    * becomes a training set. anchor = cluster exemplar, positive = each
    * duplicate, negative = the next exemplar in id order (a different
    * cluster by construction — deterministic, no RNG). Shares the
    * cached CC table with every other dedup consumer; the negative
    * window runs over |clusters| rows, not the corpus.
    */
  private val contrastiveQ = Q(
    "t_cluster_contrastive_pairs",
    (s, d) => {
      val cl = clusters(Tables(s, d).documents, 0.8)
      val pos = cl.filter(col("is_duplicate"))
        .select(col("cluster").as("anchor"), col("doc_id").as("positive"))
      val negs = cl.filter(!col("is_duplicate"))
        .select(col("doc_id").as("anchor"))
        .withColumn("negative", lead(col("anchor"), 1).over(
          org.apache.spark.sql.expressions.Window.orderBy("anchor")))
        .filter(col("negative").isNotNull)
      pos.join(negs, "anchor")
    },
    Some(
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
        |      i -> concat_ws(' ', string_split(text,' ')[i],
        |                          string_split(text,' ')[i+1],
        |                          string_split(text,' ')[i+2]))) AS sh
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |sym AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |walk(id, comp) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.id),
        |cl AS (
        |  SELECT id AS doc_id, min(comp) AS cluster,
        |         id <> min(comp) AS is_duplicate
        |  FROM walk GROUP BY id),
        |ex AS (
        |  SELECT doc_id AS anchor,
        |    lead(doc_id) OVER (ORDER BY doc_id) AS negative
        |  FROM cl WHERE NOT is_duplicate)
        |SELECT p.anchor, p.positive, e.negative
        |FROM (SELECT cluster AS anchor, doc_id AS positive
        |      FROM cl WHERE is_duplicate) p
        |JOIN ex e ON p.anchor = e.anchor
        |WHERE e.negative IS NOT NULL""".stripMargin),
  )

  /** Leakage-safe train/test split: assignment is by DEDUP CLUSTER, not
    * by document — a plain per-doc hash split puts two near-duplicates
    * of the same page on opposite sides and the eval set silently tests
    * memorisation. Here every doc maps to its cluster id (singleton =
    * itself), and the 80/20 cut hashes the CLUSTER, so a whole
    * near-duplicate family lands on one side by construction. Shares
    * the cached CC table with every other dedup consumer; the split
    * itself is the deterministicSample md5-threshold compare
    * (floor(0.8·2³²) = 0xcccccccc), partition-stable and SQL-replayable.
    */
  private val clusterSplitQ = Q(
    "t_cluster_split",
    (s, d) => {
      val docs = Tables(s, d).documents
      val cl = clusters(docs, 0.8).select(col("doc_id"), col("cluster"))
      val withCluster = docs.select(col("doc_id"))
        .join(cl, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"))
      withCluster.withColumn("split",
        when(substring(md5(col("cluster").cast("string")), 1, 8)
          < "cccccccc", "train").otherwise("test"))
    },
    Some(
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
        |      i -> concat_ws(' ', string_split(text,' ')[i],
        |                          string_split(text,' ')[i+1],
        |                          string_split(text,' ')[i+2]))) AS sh
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |sym AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |walk(id, comp) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.id),
        |cl AS (SELECT id AS doc_id, min(comp) AS cluster
        |       FROM walk GROUP BY id),
        |wc AS (
        |  SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN cl USING (doc_id))
        |SELECT doc_id, cluster,
        |  CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 8)
        |    < 'cccccccc' THEN 'train' ELSE 'test' END AS split
        |FROM wc""".stripMargin),
  )

  /** Quality-aware exemplar selection — FineWeb-style "keep the best
    * copy": per near-dup cluster, the surviving document is the one
    * with the MOST whitespace tokens (exact BIGINT, so the pick is
    * engine-identical), ties to the smallest id; min-id exemplar (`d5`)
    * is the arbitrary-but-stable default, this is the curation-quality
    * upgrade. Adds one token-count map + one cluster-keyed
    * WindowGroupLimit over the cached cluster table — the CC loop is
    * shared, the window input is |matched docs|.
    */
  private val qualityExemplarQ = Q(
    "d_quality_exemplar",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, d).documents
      val cl = clusters(docs, 0.8).select("doc_id", "cluster")
      val toks = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      val w = Window.partitionBy("cluster")
        .orderBy(desc("toks"), asc("doc_id"))
      cl.join(toks, "doc_id")
        .withColumn("rn", row_number().over(w))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy("cluster")))
        .filter(col("rn") === 1)
        .select(col("cluster"), col("doc_id").as("exemplar_doc"),
          col("toks").as("exemplar_tokens"), col("n_members"))
    },
    Some(
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
        |      i -> concat_ws(' ', string_split(text,' ')[i],
        |                          string_split(text,' ')[i+1],
        |                          string_split(text,' ')[i+2]))) AS sh
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |sym AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |walk(id, comp) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.id),
        |mem AS (SELECT id, min(comp) AS cluster FROM walk GROUP BY id),
        |tk AS (SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |       FROM documents),
        |r AS (
        |  SELECT mem.cluster, mem.id, tk.toks,
        |    row_number() OVER (PARTITION BY mem.cluster
        |      ORDER BY tk.toks DESC, mem.id ASC) AS rn,
        |    count(*) OVER (PARTITION BY mem.cluster) AS n
        |  FROM mem JOIN tk ON mem.id = tk.doc_id)
        |SELECT cluster, id AS exemplar_doc, toks AS exemplar_tokens,
        |  CAST(n AS BIGINT) AS n_members
        |FROM r WHERE rn = 1""".stripMargin),
  )

  def queries: Seq[Q] =
    Seq(q, corpusQ, contrastiveQ, clusterSplitQ, qualityExemplarQ)
}
