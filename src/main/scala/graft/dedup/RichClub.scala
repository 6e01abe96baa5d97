package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rich-club coefficient (Zhou & Mondragón 2004) — do the HIGH-degree
  * nodes preferentially connect to EACH OTHER? φ(k) = 2·E_k /
  * (N_k·(N_k−1)) over the subgraph of nodes with degree > k, per
  * threshold k. The structural companion to `d23_assortativity`: r is
  * one global correlation, φ(k) localises WHERE in the degree spectrum
  * the clubbing happens (a graph can be globally disassortative yet
  * have a tight hub club — exactly the case that matters for
  * `d11_pagerank` mass concentration and `d13_kcore` shell density).
  *
  * All counting is exact integers (degree thresholds, node counts, and
  * the edge survivals are one degree-join + filter per threshold in a
  * single pass: thresholds broadcast, edges scanned once); φ is one
  * final division. Scale: degrees from one edge aggregate; the
  * per-threshold rollup groups by (k) over edges × |thresholds| rows —
  * thresholds are a handful, so the fanout is a small constant.
  */
object RichClub {

  val Thresholds = Seq(2L, 4L, 8L, 16L, 32L)

  /** (k, n_nodes, n_edges, phi) per threshold; phi NULL when fewer than
    * two nodes clear the bar.
    */
  def coefficients(und: DataFrame): DataFrame = {
    val spark = und.sparkSession
    import spark.implicits._
    val sym = und.select(col("src").as("a"), col("dst").as("b"))
      .union(und.select(col("dst").as("a"), col("src").as("b")))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
      .select(col("a").as("n"), col("deg"))
    val ks = Thresholds.toDF("k")
    val nodes = deg.crossJoin(broadcast(ks))
      .filter(col("deg") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_nodes"))
    val edges = und
      .join(deg.select(col("n").as("src"), col("deg").as("dsrc")), "src")
      .join(deg.select(col("n").as("dst"), col("deg").as("ddst")), "dst")
      .crossJoin(broadcast(ks))
      .filter(col("dsrc") > col("k") && col("ddst") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_edges"))
    broadcast(ks)
      .join(nodes, Seq("k"), "left")
      .join(edges, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"))
      .withColumn("phi",
        when(col("n_nodes") >= 2,
          (lit(2L) * col("n_edges")).cast("double") /
            (col("n_nodes") * (col("n_nodes") - 1L)).cast("double")))
  }

  private val q = Q(
    "d26_rich_club",
    (s, d) => coefficients(Tables(s, d).lineitem
      .select(col("l_partkey").as("src"),
        (col("l_suppkey") + 10000000L).as("dst"))
      .distinct()),
    Some {
      val ks = Thresholds.map(k => s"($k)").mkString(", ")
      s"""WITH und AS (
         |  SELECT DISTINCT l_partkey AS src, l_suppkey + 10000000 AS dst
         |  FROM lineitem),
         |sym AS (SELECT src AS a, dst AS b FROM und
         |        UNION ALL SELECT dst, src FROM und),
         |deg AS (SELECT a AS n, count(*) AS deg FROM sym GROUP BY 1),
         |ks(k) AS (VALUES $ks),
         |nn AS (
         |  SELECT ks.k, CAST(count(*) AS BIGINT) AS n_nodes
         |  FROM deg CROSS JOIN ks WHERE deg.deg > ks.k GROUP BY 1),
         |ee AS (
         |  SELECT ks.k, CAST(count(*) AS BIGINT) AS n_edges
         |  FROM und
         |  JOIN deg da ON und.src = da.n
         |  JOIN deg db ON und.dst = db.n
         |  CROSS JOIN ks
         |  WHERE da.deg > ks.k AND db.deg > ks.k GROUP BY 1)
         |SELECT CAST(ks.k AS BIGINT) AS k,
         |  coalesce(nn.n_nodes, 0) AS n_nodes,
         |  coalesce(ee.n_edges, 0) AS n_edges,
         |  CASE WHEN coalesce(nn.n_nodes, 0) >= 2 THEN
         |    CAST(2 * coalesce(ee.n_edges, 0) AS DOUBLE) /
         |    CAST(coalesce(nn.n_nodes, 0)
         |      * (coalesce(nn.n_nodes, 0) - 1) AS DOUBLE) END AS phi
         |FROM ks LEFT JOIN nn ON ks.k = nn.k
         |        LEFT JOIN ee ON ks.k = ee.k""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
