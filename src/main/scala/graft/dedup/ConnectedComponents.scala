package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an edge-list DataFrame.
  *
  * The reference materialises the whole similarity graph on one machine
  * and runs `networkx.connected_components` (dqa/data_getters.py:312-320)
  * — the single clearest place its design cannot scale. Here: the
  * alternating **large-star / small-star** algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14), which
  * converges in O(log n) rounds of pure `groupBy`/`join` — no driver
  * state, no GraphFrames dependency.
  *
  * Scale posture: each round is two hash aggregations + one join on the
  * edge list; lineage is cut every round with `localCheckpoint` so plans
  * don't grow unboundedly (on a real cluster, set a checkpoint dir and
  * use `checkpoint` for fault-tolerance instead).
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (src, dst); undirected, any order.
    * @param nodeSet optional one-column (id) universe — isolated nodes
    *   (no edges) become singleton components. Defaults to edge endpoints.
    * @return DataFrame (id, component) where component = min id reachable.
    */
  def run(edges: DataFrame, nodeSet: Option[DataFrame] = None,
      maxIterations: Int = 50): DataFrame = {
    val nodes = nodeSet
      .getOrElse(edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))))
      .select(col(nodeSet.map(_.columns.head).getOrElse("id")).as("id"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // parent pointers: start from the symmetrized edge list as (u, v)
    var g = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    // one large-star + small-star alternation, lazily composed
    def alternate(in: DataFrame): DataFrame = {
      // view the current graph undirected for the large-star step
      val sym = in.union(in.select(col("v").as("u"), col("u").as("v")))
      // large-star: connect every strictly-larger neighbor of u to the
      // minimum of u's neighborhood (including u itself)
      val mins = sym.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // no distinct on large: small-star's distinct dedups the output;
      // duplicate intermediates only fan into the same (u, min) pairs.
      // small-star: large-star edges all point big→small already; point
      // each down-neighbor (and u itself) at the down-neighborhood min
      val dmins = large.groupBy("u").agg(min(col("v")).as("m"))
      large.join(dmins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(dmins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var converged = false
    var iter = 0
    var gCount = -1L // edge count of g, carried across rounds (saves a job)
    while (!converged && iter < maxIterations) {
      // one alternation per materialization: the alternation's inner
      // subtrees fan out (large feeds both dmins and the join), so
      // composing rounds without a barrier recomputes them
      // combinatorially — measured slower, not faster
      val small = alternate(g)
        .localCheckpoint(true)

      if (gCount < 0) gCount = g.count()
      val smallCount = small.count()
      val changed = smallCount != gCount ||
        small.join(g, Seq("u", "v"), "left_anti").limit(1).count() > 0
      g.unpersist()
      g = small
      gCount = smallCount
      converged = !changed
      iter += 1
    }

    // after convergence every edge is (node -> component root); isolated
    // nodes (none here, but contract-wise) map to themselves
    val assigned = g.select(col("u").as("id"), col("v").as("component"))
    val result = nodes
      .join(assigned, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
    nodes.unpersist()
    result
  }
}
