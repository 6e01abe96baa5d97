package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge-list DataFrame — the second
  * iterative graph operator beside [[ConnectedComponents]] (the
  * reference's graph work is single-machine networkx; SURVEY §2.6 flags
  * the subgraph machinery as the scale boundary). Each iteration is one
  * join (ranks onto out-edges) + one aggregation (incoming mass per
  * node) — the canonical BSP shape that runs at any corpus size; 10
  * fixed iterations, lineage cut per round.
  *
  * INTEGER-UNIT determinism: ranks live in integer micro-units
  * (1e6 = 1.0), per-edge contributions are `rank div outdeg` and the
  * damping step is `150000 + (85 · Σin) div 100` — floor division at
  * every step, so the fixpoint trajectory is bit-identical on any
  * engine and partitioning (float PageRank is accumulation-order
  * dependent). Truncation mass (< outdeg units per node per round) is
  * deliberately dropped — the spec IS the integer recurrence, which an
  * independent SQL engine replays as 10 chained CTEs.
  */
object PageRank {

  val BaseUnits = 1000000L
  val Iterations = 10

  /** @param edges directed (src, dst) — symmetrize upstream if needed.
    * @param nodes one-column (id) universe; isolated nodes converge to
    *   the damped floor 150000 units.
    * @return (id, rank_units) after [[Iterations]] rounds.
    */
  def run(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // out-edges with their degree, reused every round
    val e = edges.join(deg, "src").localCheckpoint(true)
    var ranks = nodes.select(col("id"), lit(BaseUnits).as("rank"))
    for (iter <- 1 to Iterations) {
      val in = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("m"))
      ranks = nodes
        .join(in.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("85 * coalesce(m, 0L) div 100")).as("rank"))
      // lineage cut EVERY round. A 5-round cadence was tried and
      // REVERTED: the rank chain is linear, so recompute is safe, but
      // the composed plan hands Catalyst a 15-join tree whose
      // optimization cost dwarfs the saved materialisation jobs
      // (measured: 2.6 s → 7.4 s warm at sf0.1). Per-round barriers
      // keep every optimizer invocation O(one round).
      ranks = ranks.localCheckpoint(false)
    }
    ranks.select(col("id"), col("rank").as("rank_units"))
  }

  // ---- registered query: PageRank over the per-nation supplier chains
  // (the same deterministic edge set d3_connected_components uses, both
  // directions) — chain interiors accumulate more mass than endpoints,
  // so the fixpoint is a real gradient, not a constant.

  private def chainEdges(t: Tables): DataFrame = {
    val w = Window.partitionBy("s_nationkey").orderBy(asc("s_suppkey"))
    val ranked = t.supplier
      .select(col("s_suppkey"), col("s_nationkey"))
      .withColumn("rn", row_number().over(w))
    val fwd = ranked.alias("a")
      .join(ranked.alias("b"),
        col("a.s_nationkey") === col("b.s_nationkey") &&
          col("a.rn") === col("b.rn") - 1)
      .select(col("a.s_suppkey").as("src"), col("b.s_suppkey").as("dst"))
    fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** The r1..rN integer-recurrence CTE chain over CTEs `nodes(id)`,
    * `e(src, dst, outdeg)` and `r0(id, rank)` — shared by every
    * PageRank-family oracle (d11 and the TextRank keyword query).
    */
  private[graft] def roundsSql: String =
    (1 to Iterations).map { k =>
      s"""r$k AS (
         |  SELECT n.id,
         |    150000 + (85 * coalesce(s.m, 0)) // 100 AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, sum(r.rank // e.outdeg) AS m
         |    FROM e JOIN r${k - 1} r ON e.src = r.id
         |    GROUP BY e.dst) s ON n.id = s.id)""".stripMargin
    }.mkString(",\n")

  private def oracleSql: String = {
    val rounds = roundsSql
    s"""WITH ranked AS (
       |  SELECT s_suppkey, s_nationkey,
       |    row_number() OVER (PARTITION BY s_nationkey
       |                       ORDER BY s_suppkey) AS rn
       |  FROM supplier),
       |fwd AS (
       |  SELECT a.s_suppkey AS src, b.s_suppkey AS dst
       |  FROM ranked a JOIN ranked b
       |    ON a.s_nationkey = b.s_nationkey AND a.rn = b.rn - 1),
       |edges AS (SELECT src, dst FROM fwd
       |          UNION ALL SELECT dst, src FROM fwd),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |e AS (SELECT edges.src, edges.dst, deg.outdeg
       |      FROM edges JOIN deg ON edges.src = deg.src),
       |nodes AS (SELECT s_suppkey AS id FROM supplier),
       |r0 AS (SELECT id, CAST($BaseUnits AS BIGINT) AS rank FROM nodes),
       |$rounds
       |SELECT id AS s_suppkey, CAST(rank AS BIGINT) AS rank_units
       |FROM r$Iterations""".stripMargin
  }

  private val q = Q(
    "d11_pagerank",
    (s, d) => {
      // memoized like every other iterative-loop product (CC, PQ): ranks
      // over a static graph are computed once per distinct input, and
      // consumers read the materialised table. Explicit key — run()'s
      // internal checkpoint barriers leave the result plan keyless.
      val t = Tables(s, d)
      graft.domain.SharedCache.materialiseWith(s,
        graft.domain.SharedCache.defaultRoot, "pagerank",
        s"pagerank-v1|${graft.domain.SharedCache.planKey(t.supplier)}" +
          s"|$Iterations")(
        run(chainEdges(t), t.supplier.select(col("s_suppkey").as("id")))
          .withColumnRenamed("id", "s_suppkey"))
    },
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q) ++ TriangleCount.queries ++ KCore.queries
}

/** The canonical undirected supplier co-occurrence graph (suppliers
  * sharing an order are adjacent; src < dst, deduplicated), memoized
  * through [[graft.domain.SharedCache]]: d12 (triangles), d14
  * (modularity) and d17 (clustering coefficient) all audit the SAME
  * static graph, so the heavy lineitem self-join + distinct builds once
  * per distinct input and every consumer reads the materialised edge
  * list — the "derive the graph once, analyse it many times" layout a
  * 100 TB pipeline would use anyway.
  */
object CoocGraph {
  def undirected(t: Tables): DataFrame = {
    val li = t.lineitem.select("l_orderkey", "l_suppkey")
    // per-order array combinations instead of a self-join (see
    // LinkPrediction.predict): one exchange on the order key, the same
    // C(items,2) fanout, identical distinct edge set — this is the cold
    // build all eight graph consumers share, so the saved exchanges pay
    // once per cache fill
    graft.domain.SharedCache.materialiseWith(li.sparkSession,
      graft.domain.SharedCache.defaultRoot, "cooc_und",
      s"cooc-und-v1|${graft.domain.SharedCache.planKey(li)}")(
      li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
        // pinned spread before the C(n,2) fanout (SCALING.md)
        .repartition(li.sparkSession.sparkContext.defaultParallelism)
        .select(explode(expr(
          """flatten(transform(ss, (p, i) ->
            |  transform(slice(ss, i + 2, size(ss)),
            |            q -> struct(p AS src, q AS dst))))""".stripMargin))
          .as("e"))
        .select(col("e.src"), col("e.dst"))
        .distinct())
  }
}

/** Triangle counting via DEGREE-ORIENTED wedge join (the compact-forward
  * algorithm; Schank & Wagner 2005, and the standard MapReduce variant in
  * Suri & Vassilvitskii, WWW'11): orient every undirected edge from its
  * lower-(degree, id) endpoint, enumerate wedges at each node over its
  * OUT-neighbours only, and close them against the oriented edge list.
  * Orientation bounds each node's out-degree by O(√m), so the wedge join
  * is Σ outdeg² ≤ O(m^1.5) — the property that makes triangle counting
  * feasible on a power-law graph where a naive wedge join at the hubs is
  * Σ deg² ≈ n². Every step is a join or an aggregate; the oracle replays
  * the identical orientation in SQL, so the count is exact, not sampled.
  */
object TriangleCount {

  /** @param edges undirected edge list (src, dst), any order/duplication.
    * @param canonical when true, `edges` is promised canonical (src <
    *   dst, deduplicated) and the normalising distinct — a full shuffle —
    *   is skipped; [[CoocGraph.undirected]] feeds this path.
    * @return one row (n_nodes, n_edges, n_triangles).
    */
  def run(edges: DataFrame, canonical: Boolean = false): DataFrame = {
    // canonical undirected edges (a < b), deduplicated
    val und =
      if (canonical) edges.select(col("src").as("a"), col("dst").as("b"))
      else edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
      .select(col("a").as("n"), col("deg"))
    // orient a→b when (deg a, a) < (deg b, b)
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    val o = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("u"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("v"))
    // wedges at u over out-neighbours (id-canonical pair), closed
    // against the oriented list. The closing side is re-canonicalised to
    // (min, max) so the close is a pure EQUI-join on both columns —
    // phrasing it as the OR of the two orientations has no conjunctive
    // equality for Catalyst to extract, and the plan degrades to a
    // nested-loop join over |wedges| × |edges|, which is exactly the
    // blow-up the degree orientation exists to avoid.
    val w1 = o.select(col("u"), col("v").as("v1"))
    val w2 = o.select(col("u"), col("v").as("v2"))
    val wedges = w1.join(w2, "u").filter(col("v1") < col("v2"))
    val closing = o.select(least(col("u"), col("v")).as("v1"),
      greatest(col("u"), col("v")).as("v2"))
    val tri = wedges.join(closing, Seq("v1", "v2"))
      .agg(count(lit(1)).as("n_triangles"))
    val counts = und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
    counts.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  /** Supplier co-occurrence graph: suppliers appearing in the same order
    * are connected — derivable identically in SQL, dense enough to have
    * real triangles.
    */
  private val q = Q(
    "d12_triangle_count",
    (s, d) => run(CoocGraph.undirected(Tables(s, d)), canonical = true),
    Some(
      """WITH und AS (
        |  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey),
        |sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
        |deg AS (SELECT a AS n, count(*) AS deg FROM sym GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN da.deg < db.deg
        |              OR (da.deg = db.deg AND und.a < und.b)
        |         THEN und.a ELSE und.b END AS u,
        |         CASE WHEN da.deg < db.deg
        |              OR (da.deg = db.deg AND und.a < und.b)
        |         THEN und.b ELSE und.a END AS v
        |  FROM und JOIN deg da ON und.a = da.n JOIN deg db ON und.b = db.n),
        |tri AS (
        |  SELECT count(*) AS n_triangles
        |  FROM o w1 JOIN o w2 ON w1.u = w2.u AND w1.v < w2.v
        |  JOIN o c ON (c.u = w1.v AND c.v = w2.v)
        |           OR (c.u = w2.v AND c.v = w1.v))
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |  CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
        |  CAST(tri.n_triangles AS BIGINT) AS n_triangles
        |FROM tri""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q) ++ ClusteringCoefficient.queries
}

/** Per-node local clustering coefficient (Watts & Strogatz 1998):
  * cc_v = 2·T_v / (deg_v·(deg_v − 1)) — how close v's neighbourhood is
  * to a clique. The node-level sibling of [[TriangleCount]]'s global
  * count and [[Modularity]]'s partition audit: high-coefficient nodes
  * sit inside dense duplicate/boilerplate clusters, low ones are
  * bridges — the standard structural feature when triaging a duplicate
  * graph.
  *
  * INTEGER-EXACT like modularity: emits the exact rational
  * (cc_num = 2·T_v, cc_den = deg·(deg−1)) plus one IEEE division for
  * display, so the gate hashes integers. Scale: the same
  * degree-oriented wedge join as the global count (each triangle
  * enumerated once, Σ min(deg) work bound), then ONE explode (3 rows
  * per triangle) + hash agg per node; degrees join back broadcast-free
  * on the node key. Nodes of degree < 2 have no defined coefficient
  * and are excluded by contract.
  */
object ClusteringCoefficient {

  /** @param edges undirected (src, dst), any order/duplication.
    * @param canonical when true, `edges` is promised canonical (src <
    *   dst, deduplicated) and the normalising distinct shuffle is
    *   skipped; [[CoocGraph.undirected]] feeds this path.
    * @return (n, n_tri, deg, cc_num, cc_den, cc) for deg ≥ 2 nodes.
    */
  def run(edges: DataFrame, canonical: Boolean = false): DataFrame = {
    val und =
      if (canonical) edges.select(col("src").as("a"), col("dst").as("b"))
      else edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
      .select(col("a").as("n"), col("deg"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    val o = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("u"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("v"))
    val w1 = o.select(col("u"), col("v").as("v1"))
    val w2 = o.select(col("u"), col("v").as("v2"))
    val wedges = w1.join(w2, "u").filter(col("v1") < col("v2"))
    // closing edges re-canonicalised to (min, max) → pure equi-join;
    // see TriangleCount.run for why the OR-of-orientations form is a
    // nested-loop trap
    val closing = o.select(least(col("u"), col("v")).as("v1"),
      greatest(col("u"), col("v")).as("v2"))
    // each triangle surfaces exactly once; explode its 3 corners
    val triNodes = wedges.join(closing, Seq("v1", "v2"))
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    deg.filter(col("deg") >= 2)
      .join(triNodes, Seq("n"), "left")
      .select(col("n"), coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        col("deg"))
      .withColumn("cc_num", lit(2L) * col("n_tri"))
      .withColumn("cc_den", col("deg") * (col("deg") - 1L))
      .withColumn("cc", round(col("cc_num") / col("cc_den"), 6))
  }

  private val q = Q(
    "d17_clustering_coefficient",
    (s, d) => run(CoocGraph.undirected(Tables(s, d)), canonical = true)
      .withColumnRenamed("n", "s_suppkey"),
    Some(
      """WITH und AS (
        |  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey),
        |sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
        |deg AS (SELECT a AS n, count(*) AS deg FROM sym GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN da.deg < db.deg
        |              OR (da.deg = db.deg AND und.a < und.b)
        |         THEN und.a ELSE und.b END AS u,
        |         CASE WHEN da.deg < db.deg
        |              OR (da.deg = db.deg AND und.a < und.b)
        |         THEN und.b ELSE und.a END AS v
        |  FROM und JOIN deg da ON und.a = da.n JOIN deg db ON und.b = db.n),
        |tn AS (
        |  SELECT unnest([w1.u, w1.v, w2.v]) AS n
        |  FROM o w1 JOIN o w2 ON w1.u = w2.u AND w1.v < w2.v
        |  JOIN o c ON (c.u = w1.v AND c.v = w2.v)
        |           OR (c.u = w2.v AND c.v = w1.v)),
        |tc AS (SELECT n, count(*) AS n_tri FROM tn GROUP BY 1)
        |SELECT deg.n AS s_suppkey,
        |  CAST(coalesce(tc.n_tri, 0) AS BIGINT) AS n_tri,
        |  CAST(deg.deg AS BIGINT) AS deg,
        |  CAST(2 * coalesce(tc.n_tri, 0) AS BIGINT) AS cc_num,
        |  CAST(deg.deg * (deg.deg - 1) AS BIGINT) AS cc_den,
        |  round(CAST(2 * coalesce(tc.n_tri, 0) AS BIGINT)
        |    / CAST(deg.deg * (deg.deg - 1) AS BIGINT), 6) AS cc
        |FROM deg LEFT JOIN tc ON deg.n = tc.n
        |WHERE deg.deg >= 2""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}

/** k-core decomposition by iterative peeling (Seidman 1983; the
  * distributed formulation of Montresor et al., TPDS 2013): repeatedly
  * delete every node of degree < k until none remain — the fixpoint is
  * the k-core, the standard "dense backbone" extractor for duplicate
  * subgraphs and co-occurrence networks (the reference's networkx
  * subgraph pass at `dqa/dedup_utils.py` caps out single-machine;
  * SURVEY §2.6). Each round is one degree aggregation + one semi-join
  * of edges against surviving nodes — BSP like [[ConnectedComponents]],
  * with a lineage cut per round and convergence detected by a cheap
  * count. Peel rounds are O(diameter of the cascade), typically < 10;
  * the oracle replays a fixed [[UnrollRounds]] unrolled rounds (identity
  * once the fixpoint is reached — KCoreSpec pins convergence within the
  * unroll at the test scale).
  */
object KCore {

  val K = 4
  /** Co-occurrence weight threshold that sparsifies the supplier graph
    * enough to have a real cascade (8 peel rounds at sf0.01).
    */
  val MinCooc = 33
  val UnrollRounds = 16

  /** @return surviving (id, core_deg) — nodes of the k-core with their
    *   within-core degree (all ≥ k by construction). Also returns the
    *   number of peel rounds via the side channel for the spec.
    */
  def run(edges: DataFrame, k: Int): (DataFrame, Int) = {
    var cur = edges.localCheckpoint(true)
    var rounds = 0
    while (true) {
      val deg = cur.select(col("a").as("n"))
        .union(cur.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
        .localCheckpoint(true)
      val nRemoved = deg.filter(col("d") < k).count()
      rounds += 1
      if (nRemoved == 0) {
        return (deg.select(col("n"), col("d").as("core_deg")), rounds)
      }
      val keep = deg.filter(col("d") >= k).select("n")
      cur = cur
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "leftsemi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "leftsemi")
        .localCheckpoint(true)
    }
    throw new IllegalStateException("unreachable")
  }

  private def cooccurrenceEdges(t: Tables): DataFrame = {
    val li = t.lineitem.select("l_orderkey", "l_suppkey")
    li.alias("x").join(li.alias("y"),
      col("x.l_orderkey") === col("y.l_orderkey") &&
        col("x.l_suppkey") < col("y.l_suppkey"))
      .groupBy(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= MinCooc)
      .select("a", "b")
  }

  private def oracleSql: String = {
    // every CTE is MATERIALIZED: each round references its predecessor
    // three times, so inlined CTEs would expand the scan tree 3^rounds
    val rounds = (1 to UnrollRounds).map { i =>
      s"""d${i - 1} AS MATERIALIZED (
         |  SELECT n, count(*) AS d FROM (
         |    SELECT a AS n FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1})
         |  GROUP BY 1),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${i - 1} e
         |  JOIN d${i - 1} da ON e.a = da.n JOIN d${i - 1} db ON e.b = db.n
         |  WHERE da.d >= $K AND db.d >= $K)""".stripMargin
    }.mkString(",\n")
    s"""WITH cooc AS (
       |  SELECT x.l_suppkey AS a, y.l_suppkey AS b, count(*) AS w
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
       |  GROUP BY 1, 2),
       |e0 AS MATERIALIZED (SELECT a, b FROM cooc WHERE w >= $MinCooc),
       |$rounds
       |SELECT n AS s_suppkey, count(*) AS core_deg FROM (
       |  SELECT a AS n FROM e$UnrollRounds
       |  UNION ALL SELECT b FROM e$UnrollRounds)
       |GROUP BY 1""".stripMargin
  }

  private val q = Q(
    "d13_kcore",
    (s, d) => {
      // memoized: the peeling loop's job count scales with rounds, and
      // the surviving core over a static graph is a build artifact
      val t = Tables(s, d)
      graft.domain.SharedCache.materialiseWith(s,
        graft.domain.SharedCache.defaultRoot, "kcore",
        s"kcore-v1|${graft.domain.SharedCache.planKey(t.lineitem)}" +
          s"|$K|$MinCooc")(
        run(cooccurrenceEdges(t), K)._1
          .withColumnRenamed("n", "s_suppkey"))
    },
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q) ++ Modularity.queries
}

/** Newman modularity of a node partition over an undirected graph —
  * the quality metric every community detector (Louvain, Leiden, label
  * propagation) optimises, and the number you report when you claim a
  * clustering "found structure": Q = Σ_c (e_c/m − (d_c/2m)²), where
  * e_c = within-community edges, d_c = community degree sum, m = |E|.
  *
  * INTEGER-EXACT: instead of the floating sum, emit per community the
  * exact numerator q_num_c = 4m·e_c − d_c² over the common denominator
  * 4m² — pure BIGINT algebra, so the gate hashes the exact rational and
  * no engine's float accumulation order matters. Σ q_num_c / 4m² is Q.
  *
  * Scale: two hash aggregates (within-edge count, degree sum) over an
  * edge list already joined to a broadcast node→community map; nothing
  * pairwise, nothing global beyond |communities| rows. Pairs naturally
  * with [[graft.dedup.ConnectedComponents]] / label propagation output
  * as the partition under audit.
  */
object Modularity {

  /** @param edges  canonical undirected edges (a < b), deduplicated.
    * @param labels (n, community) covering every endpoint.
    * @return per community: n_nodes, e_within, deg_sum, q_num (over the
    *   shared denominator 4m²), plus the constant n_edges column.
    */
  def run(edges: DataFrame, labels: DataFrame): DataFrame = {
    val la = labels.select(col("n").as("a"), col("community").as("ca"))
    val lb = labels.select(col("n").as("b"), col("community").as("cb"))
    val lab = edges.join(broadcast(la), "a").join(broadcast(lb), "b")
      .localCheckpoint(false)
    val within = lab.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("e_within"))
    val degs = lab.select(col("ca").as("community"))
      .union(lab.select(col("cb").as("community")))
      .groupBy("community").agg(count(lit(1)).as("deg_sum"))
    val sizes = labels.groupBy("community")
      .agg(count(lit(1)).as("n_nodes"))
    val m = lab.agg(count(lit(1)).as("n_edges"))
    sizes
      .join(degs, Seq("community"), "left")
      .join(within, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"), col("n_edges"),
        coalesce(col("e_within"), lit(0L)).as("e_within"),
        coalesce(col("deg_sum"), lit(0L)).as("deg_sum"))
      .withColumn("q_num",
        lit(4L) * col("n_edges") * col("e_within") -
          col("deg_sum") * col("deg_sum"))
  }

  private val q = Q(
    "d14_modularity",
    (s, d) => {
      val t = Tables(s, d)
      val edges = CoocGraph.undirected(t)
        .select(col("src").as("a"), col("dst").as("b"))
      val labels = t.supplier.select(col("s_suppkey").as("n"),
        col("s_nationkey").as("community"))
      run(edges, labels)
    },
    Some(
      """WITH und AS (
        |  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey),
        |lab AS (
        |  SELECT und.a, und.b, sa.s_nationkey AS ca, sb.s_nationkey AS cb
        |  FROM und JOIN supplier sa ON und.a = sa.s_suppkey
        |           JOIN supplier sb ON und.b = sb.s_suppkey),
        |within AS (
        |  SELECT ca AS community, count(*) AS e_within
        |  FROM lab WHERE ca = cb GROUP BY 1),
        |degs AS (
        |  SELECT community, count(*) AS deg_sum FROM (
        |    SELECT ca AS community FROM lab
        |    UNION ALL SELECT cb FROM lab)
        |  GROUP BY 1),
        |sizes AS (
        |  SELECT s_nationkey AS community, count(*) AS n_nodes
        |  FROM supplier GROUP BY 1),
        |m AS (SELECT count(*) AS n_edges FROM lab)
        |SELECT sizes.community, sizes.n_nodes, m.n_edges,
        |  CAST(coalesce(within.e_within, 0) AS BIGINT) AS e_within,
        |  CAST(coalesce(degs.deg_sum, 0) AS BIGINT) AS deg_sum,
        |  CAST(4 * m.n_edges * coalesce(within.e_within, 0)
        |    - coalesce(degs.deg_sum, 0) * coalesce(degs.deg_sum, 0)
        |    AS BIGINT) AS q_num
        |FROM sizes
        |LEFT JOIN degs ON sizes.community = degs.community
        |LEFT JOIN within ON sizes.community = within.community
        |CROSS JOIN m""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
