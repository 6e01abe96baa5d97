package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community conductance — the cut-quality audit d14's modularity
  * can't provide (modularity rewards dense insides; conductance
  * measures how LEAKY the boundary is, and is the objective sweep
  * cuts/spectral methods optimise):
  *
  *   φ(C) = cut(C) / min(vol(C), 2m − vol(C))
  *
  * cut = edges with exactly one endpoint in C, vol = Σ degrees in C.
  * All counts exact BIGINT off ONE label-joined edge list; the
  * single division is the only float op.
  *
  * Shape: the d14 discipline — edge list joined to a broadcast
  * node→community map, two hash aggregates, |communities|-row
  * finale. Nothing pairwise beyond the edge list itself.
  */
object Conductance {

  /** @param edges  canonical undirected edges (a < b), deduplicated.
    * @param labels (n, community) covering every endpoint.
    */
  def run(edges: DataFrame, labels: DataFrame): DataFrame = {
    val la = labels.select(col("n").as("a"), col("community").as("ca"))
    val lb = labels.select(col("n").as("b"), col("community").as("cb"))
    val lab = edges.join(broadcast(la), "a").join(broadcast(lb), "b")
      .localCheckpoint(false)
    val cut = lab.filter(col("ca") =!= col("cb"))
      .select(explode(array(col("ca"), col("cb"))).as("community"))
      .groupBy("community").agg(count(lit(1)).as("cut"))
    val vol = lab
      .select(explode(array(col("ca"), col("cb"))).as("community"))
      .groupBy("community").agg(count(lit(1)).as("vol"))
    val m = lab.agg(count(lit(1)).as("n_edges"))
    vol.join(cut, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("vol"),
        coalesce(col("cut"), lit(0L)).as("cut"), col("n_edges"))
      .withColumn("conductance", round(
        col("cut").cast("double") /
          least(col("vol"), lit(2L) * col("n_edges") - col("vol"))
            .cast("double"), 6))
  }

  private val q = Q(
    "d33_conductance",
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
        |ends AS (
        |  SELECT ca AS community, ca <> cb AS is_cut FROM lab
        |  UNION ALL SELECT cb, ca <> cb FROM lab),
        |agg AS (
        |  SELECT community, count(*) AS vol,
        |    CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END) AS BIGINT) AS cut
        |  FROM ends GROUP BY 1),
        |m AS (SELECT count(*) AS n_edges FROM lab)
        |SELECT community, vol, cut, n_edges,
        |  round(CAST(cut AS DOUBLE) /
        |    CAST(least(vol, 2 * n_edges - vol) AS DOUBLE), 6)
        |    AS conductance
        |FROM agg CROSS JOIN m""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
