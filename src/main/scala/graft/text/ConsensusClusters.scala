package graft.text

import graft.{Q, Tables}
import graft.dedup.ConnectedComponents
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Consensus clustering — the data-pipeline half of the reference's
  * `ConsensusClustering` class (labs/skills/cluster_utils.py:24-294).
  *
  * The reference builds an ensemble of N stochastic clusterings, forms the
  * pairwise co-clustering ("COOC") matrix — the fraction of ensemble runs
  * that place two nodes in the same cluster (`cooccurrence_matrix`,
  * cluster_utils.py:233-262) — and re-clusters that consensus graph
  * (`consensus_partition`:264-271). The ensemble generation is
  * model-construction (Leiden on one machine, out of scope per SURVEY §2);
  * the matrix build and the consensus re-cluster are pure data-pipeline
  * steps and distribute cleanly:
  *
  *  - the co-clustering count is a self-join on (run, label) — the cluster
  *    label itself is the blocking key, so the fan-out is Σ|cluster|² per
  *    run, never global n²; the pair count is a map-side-combinable
  *    groupBy on (src, dst);
  *  - the consensus re-cluster thresholds the matrix and runs the
  *    O(log n) large/small-star components loop — deterministic, no
  *    driver state (the reference's final Leiden pass is again
  *    single-machine model fitting; thresholded components is the
  *    deterministic, distributable consensus rule).
  */
object ConsensusClusters {

  /** Pairwise consensus weights from an ensemble of clusterings.
    *
    * @param ensemble (run_id, node, label) — one row per node per run.
    * @return (src, dst, w) with src < dst and w = co-clustered runs /
    *         total runs, matching `cooccurrence_matrix`'s M / len(ensemble)
    *         normalisation (cluster_utils.py:258-262).
    */
  def consensusMatrix(ensemble: DataFrame): DataFrame = {
    val nRuns = ensemble.agg(countDistinct(col("run_id")).as("n_runs"))
    coClusterCounts(ensemble)
      .crossJoin(broadcast(nRuns))
      .select(col("src"), col("dst"),
        (col("n_co").cast("double") / col("n_runs").cast("double")).as("w"))
  }

  /** (src, dst, n_co): number of runs placing the pair in one cluster. */
  private def coClusterCounts(ensemble: DataFrame): DataFrame =
    ensemble.alias("a")
      .join(ensemble.alias("b"),
        col("a.run_id") === col("b.run_id") &&
          col("a.label") === col("b.label") &&
          col("a.node") < col("b.node"))
      .groupBy(col("a.node").as("src"), col("b.node").as("dst"))
      .agg(count(lit(1)).as("n_co"))

  /** Consensus communities: keep pairs co-clustered in at least `minRuns`
    * runs, take connected components; nodes agreeing with nobody become
    * singletons (their own community id).
    */
  def consensusCommunities(ensemble: DataFrame, minRuns: Long): DataFrame =
    ConnectedComponents.run(
      coClusterCounts(ensemble).filter(col("n_co") >= minRuns)
        .select("src", "dst"),
      nodeSet = Some(ensemble.select(col("node").as("id")).distinct()))
      .select(col("id").as("node"), col("component").as("community"))

  // ---- hierarchical subclustering (subcluster_nodes, :674-745) ---------

  /** Second-level communities: re-threshold the ensemble at a stricter
    * `minRunsSub` and take components WITHIN each parent community (the
    * reference re-runs clustering on one cluster's nodes at a time; the
    * parent-equality filter is the all-clusters-at-once form of the same
    * restriction). Returns (node, community, subcommunity).
    */
  def subCommunities(ensemble: DataFrame, labels: DataFrame,
      minRunsSub: Long): DataFrame = {
    val lbl = labels.select(col("node"), col("community"))
    val subEdges = coClusterCounts(ensemble)
      .filter(col("n_co") >= minRunsSub)
      .join(lbl.select(col("node").as("src"), col("community").as("c_src")),
        Seq("src"))
      .join(lbl.select(col("node").as("dst"), col("community").as("c_dst")),
        Seq("dst"))
      .filter(col("c_src") === col("c_dst"))
      .select("src", "dst")
    ConnectedComponents.run(subEdges,
        nodeSet = Some(lbl.select(col("node").as("id")).distinct()))
      .select(col("id").as("node"), col("component").as("subcommunity"))
      .join(lbl, Seq("node"))
      .select(col("node"), col("community"), col("subcommunity"))
  }

  // ---- partition agreement (ensemble_AMI analog, :313-355) -------------

  /** Normalized mutual information between two partitions of the same
    * node set — the deterministic agreement score standing in for the
    * reference's sklearn AMI (the adjustment term is a hypergeometric
    * expectation, model-statistics land; NMI with arithmetic-mean
    * normalisation is sklearn's `normalized_mutual_info_score` default).
    *
    * Everything reduces to counts; the per-cell `p·ln(...)` terms are
    * summed via [[graft.util.Stable]] decimal casts so the result is
    * order-independent and engine-identical. One row:
    * (mi, h1, h2, nmi), all rounded to 6 dp.
    */
  def partitionNmi(p1: DataFrame, p2: DataFrame): DataFrame = {
    val joined = p1.select(col("node"), col("label").as("l1"))
      .join(p2.select(col("node"), col("label").as("l2")), Seq("node"))
    val nF = broadcast(joined.agg(count(lit(1)).cast("double").as("n")))
    val cells = joined.groupBy("l1", "l2")
      .agg(count(lit(1)).cast("double").as("nij"))
    val am = joined.groupBy("l1").agg(count(lit(1)).cast("double").as("ai"))
    val bm = joined.groupBy("l2").agg(count(lit(1)).cast("double").as("bj"))
    val mi = cells.join(broadcast(am), "l1").join(broadcast(bm), "l2")
      .crossJoin(nF)
      .select(((col("nij") / col("n")) *
        log(col("n") * col("nij") / (col("ai") * col("bj")))).as("term"))
      .agg(graft.util.Stable.dsum(col("term"), 9).as("mi"))
    def entropy(m: DataFrame, cnt: String, out: String) = m.crossJoin(nF)
      .select(((col(cnt) / col("n")) * log(col(cnt) / col("n")) *
        lit(-1.0)).as("t"))
      .agg(graft.util.Stable.dsum(col("t"), 9).as(out))
    broadcast(mi).crossJoin(broadcast(entropy(am, "ai", "h1")))
      .crossJoin(broadcast(entropy(bm, "bj", "h2")))
      .select(round(col("mi"), 6).as("mi"), round(col("h1"), 6).as("h1"),
        round(col("h2"), 6).as("h2"),
        // zero-entropy partitions (everything in one cluster) ⇒ 0, like
        // sklearn's eps-guarded normalizer — never NaN
        round(when(col("h1") + col("h2") === 0.0, 0.0)
          .otherwise(col("mi") / ((col("h1") + col("h2")) / 2.0)), 6)
          .as("nmi"))
  }

  // ---- affinity diagnostics (cluster_utils.py:437-558) -----------------
  //
  // All affinities reduce to S_xy / (N · sizes): an INTEGER sum of
  // co-cluster counts divided once at the end. Summing integers (not the
  // already-normalised doubles) keeps the result independent of
  // aggregation order — bit-identical across engines and partitionings.

  /** Symmetrized integer co-counts, diagonal included (a node co-clusters
    * with itself in every run) — the sparse form of the reference's COOC
    * matrix before normalisation.
    */
  private def symCounts(ensemble: DataFrame): DataFrame = {
    val nRuns = ensemble.agg(countDistinct(col("run_id")).as("n_runs"))
    val cnt = coClusterCounts(ensemble)
    cnt.select(col("src").as("i"), col("dst").as("j"), col("n_co"))
      .union(cnt.select(col("dst").as("i"), col("src").as("j"), col("n_co")))
      .union(ensemble.select(col("node")).distinct()
        .crossJoin(broadcast(nRuns))
        .select(col("node").as("i"), col("node").as("j"),
          col("n_runs").as("n_co")))
  }

  /** Node→cluster affinity (`node_affinity`, cluster_utils.py:437-476):
    * the average co-clustering occurrence between a node and all members
    * of each community — long-form (node, community, affinity), zero
    * cells materialised like the reference's dense matrix. With
    * `normalise` the row is scaled to sum to 1 (membership probability).
    *
    * Scale: the output is inherently n×k (k = number of communities —
    * taxonomy-sized, not corpus-sized); the sparse sums join is blocked
    * by community and map-side combined.
    */
  def nodeAffinity(ensemble: DataFrame, labels: DataFrame,
      normalise: Boolean = true): DataFrame = {
    val lbl = labels.select(col("node"), col("community"))
    val csize = lbl.groupBy("community").agg(count(lit(1)).as("c_size"))
    val nRuns = ensemble.agg(countDistinct(col("run_id")).as("n_runs"))
    val sums = symCounts(ensemble)
      .join(lbl.select(col("node").as("j"), col("community")), Seq("j"))
      .groupBy(col("i").as("node"), col("community"))
      .agg(sum(col("n_co")).as("s"))
    val abs = lbl.select(col("node")).crossJoin(broadcast(csize))
      .join(sums, Seq("node", "community"), "left")
      .crossJoin(broadcast(nRuns))
      .select(col("node"), col("community"),
        (coalesce(col("s"), lit(0L)).cast("double") /
          (col("n_runs") * col("c_size")).cast("double")).as("affinity"))
    if (!normalise) abs
    else abs.withColumn("affinity", col("affinity") /
      sum(col("affinity")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("node")))
  }

  /** Cluster→cluster affinity (`cluster_affinity_matrix`,
    * cluster_utils.py:517-558): average co-clustering occurrence between
    * the members of two communities. Computed directly as
    * S_kl / (N·|k|·|l|) — already symmetric because the co-count matrix
    * is, so the reference's 0.5·(C+Cᵀ) step is the identity here.
    */
  def clusterAffinity(ensemble: DataFrame, labels: DataFrame): DataFrame = {
    val lbl = labels.select(col("node"), col("community"))
    val csize = lbl.groupBy("community").agg(count(lit(1)).as("c_size"))
    val nRuns = ensemble.agg(countDistinct(col("run_id")).as("n_runs"))
    val sums = symCounts(ensemble)
      .join(lbl.select(col("node").as("i"), col("community").as("c_src")),
        Seq("i"))
      .join(lbl.select(col("node").as("j"), col("community").as("c_dst")),
        Seq("j"))
      .groupBy(col("c_src"), col("c_dst"))
      .agg(sum(col("n_co")).as("s"))
    csize.select(col("community").as("c_src"), col("c_size").as("size_src"))
      .crossJoin(broadcast(
        csize.select(col("community").as("c_dst"),
          col("c_size").as("size_dst"))))
      .join(sums, Seq("c_src", "c_dst"), "left")
      .crossJoin(broadcast(nRuns))
      .select(col("c_src"), col("c_dst"),
        (coalesce(col("s"), lit(0L)).cast("double") /
          (col("n_runs") * col("size_src") * col("size_dst")).cast("double"))
          .as("affinity"))
  }

  // ---- oracled fixture queries -----------------------------------------
  //
  // A deterministic 3-run ensemble over documents: run r buckets doc ids
  // at granularity 10/20/40. Same-10 pairs co-cluster in all 3 runs,
  // same-20-not-10 in 2, same-40-not-20 in 1 — every consensus weight
  // level appears, and minRuns=2 communities are exactly the 20-blocks.

  private def ensembleOf(t: Tables): DataFrame =
    t.documents.select(col("doc_id").as("node"),
      explode(array(
        struct(lit(1).as("run_id"), floor(col("doc_id") / 10).as("label")),
        struct(lit(2).as("run_id"), floor(col("doc_id") / 20).as("label")),
        struct(lit(3).as("run_id"), floor(col("doc_id") / 40).as("label"))))
        .as("rl"))
      .select(col("rl.run_id"), col("node"), col("rl.label"))

  private val ensembleSql =
    """ens AS (
      |  SELECT r.run_id, doc_id AS node,
      |    CASE WHEN r.run_id = 1 THEN doc_id // 10
      |         WHEN r.run_id = 2 THEN doc_id // 20
      |         ELSE doc_id // 40 END AS label
      |  FROM documents, (SELECT unnest([1, 2, 3]) AS run_id) r)""".stripMargin

  private val qMatrix = Q(
    "dom_consensus_matrix",
    (s, d) => consensusMatrix(ensembleOf(Tables(s, d))),
    Some(
      s"""WITH $ensembleSql
         |SELECT a.node AS src, b.node AS dst,
         |  CAST(count(*) AS DOUBLE) /
         |    (SELECT CAST(count(DISTINCT run_id) AS DOUBLE) FROM ens) AS w
         |FROM ens a JOIN ens b
         |  ON a.run_id = b.run_id AND a.label = b.label AND a.node < b.node
         |GROUP BY 1, 2""".stripMargin),
  )

  /** The minRuns=2 fixture labels, materialised content-addressed so the
    * five queries composing them (communities, two affinities,
    * subcommunities, and any later consumer) run the components loop once
    * per (data, params) state — same sharing the reference gets by
    * passing cached clusterings between flow steps.
    */
  private def cachedLabels(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.domain.SharedCache.materialiseWith(s,
      graft.domain.SharedCache.defaultRoot,
      "consensus-labels", s"$d|consensus-ensemble-10-20-40-minruns2|v1") {
      consensusCommunities(ensembleOf(Tables(s, d)), minRuns = 2L)
    }

  private val qCommunities = Q(
    "dom_consensus_communities",
    (s, d) => cachedLabels(s, d),
    Some(
      s"""WITH RECURSIVE $ensembleSql,
         |edges AS (
         |  SELECT a.node AS src, b.node AS dst
         |  FROM ens a JOIN ens b
         |    ON a.run_id = b.run_id AND a.label = b.label AND a.node < b.node
         |  GROUP BY 1, 2
         |  HAVING count(*) >= 2),
         |sym AS (
         |  SELECT src AS a, dst AS b FROM edges
         |  UNION SELECT dst, src FROM edges),
         |walk(id, comp) AS (
         |  SELECT a, a FROM sym
         |  UNION
         |  SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.id),
         |labeled AS (
         |  SELECT id, min(comp) AS community FROM walk GROUP BY id)
         |SELECT n.node, coalesce(l.community, n.node) AS community
         |FROM (SELECT DISTINCT node FROM ens) n
         |LEFT JOIN labeled l ON n.node = l.id""".stripMargin),
  )

  // Shared oracle CTEs for the affinity queries. Labels use the closed
  // form of the fixture's minRuns=2 communities — contiguous ids make the
  // min-id component label exactly (node // 20) * 20, the identity the
  // dom_consensus_communities oracle proves.
  private val affinityCtes =
    s"""$ensembleSql,
       |cnt AS (
       |  SELECT a.node AS i, b.node AS j, count(*) AS n_co
       |  FROM ens a JOIN ens b
       |    ON a.run_id = b.run_id AND a.label = b.label AND a.node < b.node
       |  GROUP BY 1, 2),
       |nodes AS (SELECT DISTINCT node FROM ens),
       |nr AS (SELECT count(DISTINCT run_id) AS n_runs FROM ens),
       |sym AS (
       |  SELECT i, j, n_co FROM cnt
       |  UNION ALL SELECT j, i, n_co FROM cnt
       |  UNION ALL SELECT node, node, (SELECT n_runs FROM nr) FROM nodes),
       |labels AS (SELECT node, (node // 20) * 20 AS community FROM nodes),
       |csize AS (
       |  SELECT community, count(*) AS c_size FROM labels GROUP BY 1)""".stripMargin

  private val qNodeAffinity = Q(
    "dom_node_affinity",
    (s, d) => {
      val ens = ensembleOf(Tables(s, d))
      nodeAffinity(ens, cachedLabels(s, d), normalise = false)
    },
    Some(
      s"""WITH RECURSIVE $affinityCtes,
         |sums AS (
         |  SELECT s.i AS node, lb.community, CAST(sum(s.n_co) AS BIGINT) AS s
         |  FROM sym s JOIN labels lb ON s.j = lb.node
         |  GROUP BY 1, 2)
         |SELECT n.node, c.community,
         |  CAST(coalesce(su.s, 0) AS DOUBLE) /
         |  CAST((SELECT n_runs FROM nr) * c.c_size AS DOUBLE) AS affinity
         |FROM nodes n CROSS JOIN csize c
         |LEFT JOIN sums su
         |  ON su.node = n.node AND su.community = c.community""".stripMargin),
  )

  private val qClusterAffinity = Q(
    "dom_cluster_affinity",
    (s, d) => {
      val ens = ensembleOf(Tables(s, d))
      clusterAffinity(ens, cachedLabels(s, d))
    },
    Some(
      s"""WITH RECURSIVE $affinityCtes,
         |sums2 AS (
         |  SELECT la.community AS c_src, lb.community AS c_dst,
         |    CAST(sum(s.n_co) AS BIGINT) AS s
         |  FROM sym s
         |  JOIN labels la ON s.i = la.node
         |  JOIN labels lb ON s.j = lb.node
         |  GROUP BY 1, 2)
         |SELECT a.community AS c_src, b.community AS c_dst,
         |  CAST(coalesce(su.s, 0) AS DOUBLE) /
         |  CAST((SELECT n_runs FROM nr) * a.c_size * b.c_size AS DOUBLE)
         |    AS affinity
         |FROM csize a CROSS JOIN csize b
         |LEFT JOIN sums2 su
         |  ON su.c_src = a.community AND su.c_dst = b.community""".stripMargin),
  )

  private val qSub = Q(
    "dom_subcommunities",
    (s, d) => {
      val ens = ensembleOf(Tables(s, d))
      subCommunities(ens, cachedLabels(s, d), minRunsSub = 3L)
    },
    Some(
      s"""WITH RECURSIVE $ensembleSql,
         |cnt AS (
         |  SELECT a.node AS src, b.node AS dst, count(*) AS n_co
         |  FROM ens a JOIN ens b
         |    ON a.run_id = b.run_id AND a.label = b.label AND a.node < b.node
         |  GROUP BY 1, 2),
         |psym AS (
         |  SELECT src AS a, dst AS b FROM cnt WHERE n_co >= 2
         |  UNION SELECT dst, src FROM cnt WHERE n_co >= 2),
         |pwalk(id, comp) AS (
         |  SELECT a, a FROM psym
         |  UNION
         |  SELECT s.a, w.comp FROM psym s JOIN pwalk w ON s.b = w.id),
         |parent AS (
         |  SELECT n.node, coalesce(p.c, n.node) AS community
         |  FROM (SELECT DISTINCT node FROM ens) n
         |  LEFT JOIN (SELECT id, min(comp) AS c FROM pwalk GROUP BY id) p
         |    ON n.node = p.id),
         |ssym AS (
         |  SELECT c.src AS a, c.dst AS b
         |  FROM cnt c
         |  JOIN parent pa ON c.src = pa.node
         |  JOIN parent pb ON c.dst = pb.node
         |  WHERE c.n_co >= 3 AND pa.community = pb.community
         |  UNION
         |  SELECT c.dst, c.src
         |  FROM cnt c
         |  JOIN parent pa ON c.src = pa.node
         |  JOIN parent pb ON c.dst = pb.node
         |  WHERE c.n_co >= 3 AND pa.community = pb.community),
         |swalk(id, comp) AS (
         |  SELECT a, a FROM ssym
         |  UNION
         |  SELECT s.a, w.comp FROM ssym s JOIN swalk w ON s.b = w.id)
         |SELECT p.node, p.community,
         |  coalesce(sq.c, p.node) AS subcommunity
         |FROM parent p
         |LEFT JOIN (SELECT id, min(comp) AS c FROM swalk GROUP BY id) sq
         |  ON p.node = sq.id""".stripMargin),
  )

  private val qNmi = Q(
    "dom_partition_nmi",
    (s, d) => {
      val ens = ensembleOf(Tables(s, d))
      partitionNmi(
        ens.filter(col("run_id") === 1).select(col("node"), col("label")),
        ens.filter(col("run_id") === 2).select(col("node"), col("label")))
    },
    Some {
      val dsum = (e: String) => graft.util.Stable.dsumSql(e, 9)
      s"""WITH $ensembleSql,
         |j AS (
         |  SELECT a.node, a.label AS l1, b.label AS l2
         |  FROM ens a JOIN ens b ON a.node = b.node
         |  WHERE a.run_id = 1 AND b.run_id = 2),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM j),
         |cells AS (
         |  SELECT l1, l2, CAST(count(*) AS DOUBLE) AS nij
         |  FROM j GROUP BY 1, 2),
         |am AS (SELECT l1, CAST(count(*) AS DOUBLE) AS ai FROM j GROUP BY 1),
         |bm AS (SELECT l2, CAST(count(*) AS DOUBLE) AS bj FROM j GROUP BY 1),
         |mi AS (
         |  SELECT ${dsum("(nij / nn.n) * ln(nn.n * nij / (ai * bj))")} AS mi
         |  FROM cells JOIN am USING (l1) JOIN bm USING (l2), nn),
         |h1 AS (
         |  SELECT ${dsum("(ai / nn.n) * ln(ai / nn.n) * -1.0")} AS h1
         |  FROM am, nn),
         |h2 AS (
         |  SELECT ${dsum("(bj / nn.n) * ln(bj / nn.n) * -1.0")} AS h2
         |  FROM bm, nn)
         |SELECT round(mi, 6) AS mi, round(h1, 6) AS h1, round(h2, 6) AS h2,
         |  round(CASE WHEN h1 + h2 = 0.0 THEN 0.0
         |        ELSE mi / ((h1 + h2) / 2.0) END, 6) AS nmi
         |FROM mi, h1, h2""".stripMargin
    },
  )

  def queries: Seq[Q] =
    Seq(qMatrix, qCommunities, qNodeAffinity, qClusterAffinity, qSub, qNmi)
}
