package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral bipartition via the Fiedler vector — the eigenvector
  * counterpart of the modularity/label-propagation community tooling
  * (Fiedler 1973; von Luxburg's spectral-clustering tutorial is the
  * standard reference): the second-smallest eigenvector of the graph
  * Laplacian L = D − A, whose sign pattern is the classic two-way cut.
  *
  * Computed as power iteration on M = cI − L (c = 2·max degree + 1 ≥
  * Gershgorin's λ_max(L) bound, so M is PSD and its dominant
  * eigenvector is the constant vector) with
  * per-round DEFLATION of that trivial component — subtracting the mean
  * re-orthogonalises against 1 — leaving the Fiedler direction as the
  * effective dominant mode. Ten fixed rounds ARE the spec; the oracle
  * replays the identical trajectory as chained CTEs.
  *
  * Scale: the per-round cost is one edges⋈vector equi join + a
  * node-keyed aggregate — the CC/PageRank BSP shape, linear in |E| —
  * and the whole product is memoized through the shared cache (a
  * spectral split of a static graph is a build artifact, not per-query
  * work). DETERMINISM: neighbour sums and the deflation mean are exact
  * decimal accumulations; every other step is the same IEEE op chain on
  * both engines, so the trajectory — including the sign of the final
  * vector — is bit-identical.
  */
object Spectral {

  val Iterations = 10
  private val Scale = 12

  private def dec(c: org.apache.spark.sql.Column) =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, Scale)))
      .cast("double")

  /** @param edges canonical undirected (src, dst), deduplicated.
    * @return (id, fiedler, side) over nodes incident to ≥ 1 edge.
    */
  def fiedler(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .localCheckpoint(true)
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("a", "id")
    val cRow = deg.agg((lit(2L) * max(col("deg")) + lit(1L)).as("c"))
    val nodes = deg.crossJoin(broadcast(cRow)).localCheckpoint(true)
    // seed: engine-neutral quadratic residues — asymmetric across any
    // natural id layout (a parity seed is orthogonal to the Fiedler
    // vector on id-symmetric community pairs, measured as a failed cut)
    var v: DataFrame = nodes.select(col("id"),
      (pmod(col("id") * col("id") + lit(3L) * col("id"), lit(7L)) - lit(3L))
        .cast("double").as("v"))
    for (_ <- 1 to Iterations) {
      val nb = sym.join(v.withColumnRenamed("id", "b"), "b")
        .groupBy("a").agg(dec(col("v")).as("ns"))
        .withColumnRenamed("a", "id")
      val y = nodes.join(v, "id").join(nb, Seq("id"), "left")
        .select(col("id"),
          ((col("c") - col("deg")).cast("double") * col("v") +
            coalesce(col("ns"), lit(0.0))).as("y"))
      val mu = y.agg((dec(col("y")) / count(lit(1))).as("mu"))
      val d = y.crossJoin(broadcast(mu))
        .select(col("id"), (col("y") - col("mu")).as("y"))
      val mx = d.agg(max(abs(col("y"))).as("m"))
      v = d.crossJoin(broadcast(mx))
        .select(col("id"), (col("y") / col("m")).as("v"))
        .localCheckpoint(false) // the PageRank rule: cut the chain per round
    }
    v.select(col("id"), round(col("v"), 6).as("fiedler"),
      (col("v") >= 0.0).as("side"))
  }

  private def oracleSql: String = {
    val rounds = (1 to Iterations).map { k =>
      s"""nb$k AS (
         |  SELECT s.a AS id,
         |    CAST(SUM(CAST(v.v AS DECIMAL(18,$Scale))) AS DOUBLE) AS ns
         |  FROM sym s JOIN v${k - 1} v ON s.b = v.id GROUP BY 1),
         |y$k AS (
         |  SELECT n.id, (n.c - n.deg) * v.v + coalesce(nb.ns, 0.0) AS y
         |  FROM nodes n JOIN v${k - 1} v USING (id)
         |  LEFT JOIN nb$k nb USING (id)),
         |mu$k AS (
         |  SELECT CAST(SUM(CAST(y AS DECIMAL(18,$Scale))) AS DOUBLE)
         |    / count(*) AS mu FROM y$k),
         |d$k AS (SELECT id, y - mu AS y FROM y$k, mu$k),
         |m$k AS (SELECT max(abs(y)) AS m FROM d$k),
         |v$k AS MATERIALIZED (SELECT id, y / m AS v FROM d$k, m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH und AS MATERIALIZED (
       |  SELECT DISTINCT x.l_suppkey AS src, y.l_suppkey AS dst
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey),
       |sym AS MATERIALIZED (SELECT src AS a, dst AS b FROM und
       |        UNION ALL SELECT dst, src FROM und),
       |deg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM sym GROUP BY 1),
       |c AS (SELECT 2 * max(deg) + 1 AS c FROM deg),
       |nodes AS MATERIALIZED (SELECT deg.id, deg.deg, c.c FROM deg, c),
       |v0 AS (
       |  SELECT id,
       |    CAST((id * id + 3 * id) % 7 - 3 AS DOUBLE) AS v
       |  FROM nodes),
       |$rounds
       |SELECT v.id AS s_suppkey, round(v.v, 6) AS fiedler,
       |  v.v >= 0.0 AS side
       |FROM v$Iterations v""".stripMargin
  }

  private val q = Q(
    "d18_spectral_bipartition",
    (s, d) => {
      val t = Tables(s, d)
      val li = t.lineitem.select("l_orderkey", "l_suppkey")
      graft.domain.SharedCache.materialiseWith(s,
        graft.domain.SharedCache.defaultRoot, "fiedler",
        s"fiedler-v3|${graft.domain.SharedCache.planKey(li)}|$Iterations")(
        fiedler(CoocGraph.undirected(t)).withColumnRenamed("id", "s_suppkey"))
    },
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
