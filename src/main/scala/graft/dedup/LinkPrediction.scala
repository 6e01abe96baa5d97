package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction (Liben-Nowell & Kleinberg 2003) over
  * the noise-pruned part co-purchase graph: for non-adjacent pairs that
  * share neighbors, score = common-neighbor count and its Jaccard
  * normalisation — the "customers who bought X also bought Y"
  * candidate miner, and in the dedup setting the "these two clusters
  * probably belong together" reviewer queue.
  *
  * Scale: the wedge self-join is Σ deg² — kept honest here by the
  * weight ≥ 2 edge prune (co-purchased at least twice, the standard
  * noise cut); at power-law scale add the hub cap (drop or sample
  * neighborhoods above deg ~10³ — hubs predict nothing anyway) and the
  * same plan survives. Jaccard is the exact rational
  * cn/(deg_a + deg_b − cn) in ppm floor-division; every exchange
  * carries 8-byte part keys.
  */
object LinkPrediction {

  def predict(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select("l_orderkey", "l_partkey")
    // pair generation as per-order array combinations, NOT a self-join:
    // one exchange on l_orderkey replaces two join-side exchanges + the
    // merge, and the fanout is identical (C(items,2) per order, bounded
    // by order size at any corpus scale). Strict a < b drops same-part
    // duplicate pairs exactly like the former x.partkey < y.partkey row
    // predicate, so edge weights are unchanged. Measured 3.1 s → ~1.6 s
    // warm at sf0.1.
    val edges = li.groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
      // pin parallelism at the fanout boundary: AQE sizes the next stage
      // by the (tiny) agg bytes and would serialise the C(n,2) explode
      // onto a few tasks (SCALING.md "Runtime planning")
      .repartition(li.sparkSession.sparkContext.defaultParallelism)
      .select(explode(expr(
        """flatten(transform(ps, (p, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |            q -> struct(p AS a, q AS b))))""".stripMargin))
        .as("e"))
      .select(col("e.a"), col("e.b"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select("a", "b")
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("n")).agg(count(lit(1)).as("deg"))
    val wedges = sym.alias("s1").join(sym.alias("s2"),
      col("s1.a") === col("s2.a") && col("s1.b") < col("s2.b"))
      .groupBy(col("s1.b").as("a"), col("s2.b").as("b"))
      .agg(count(lit(1)).as("cn"))
    wedges.join(edges, Seq("a", "b"), "left_anti")
      .join(deg.withColumnRenamed("n", "a")
        .withColumnRenamed("deg", "deg_a"), "a")
      .join(deg.withColumnRenamed("n", "b")
        .withColumnRenamed("deg", "deg_b"), "b")
      .select(col("a"), col("b"), col("cn"), col("deg_a"), col("deg_b"),
        expr("(1000000 * cn) div (deg_a + deg_b - cn)").as("jaccard_ppm"))
  }

  private val q = Q(
    "d20_link_prediction",
    (s, d) => predict(Tables(s, d).lineitem),
    Some(
      """WITH und AS (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
        |deg AS (SELECT a AS n, count(*) AS deg FROM sym GROUP BY 1),
        |cn AS (
        |  SELECT s1.b AS a, s2.b AS b, count(*) AS cn
        |  FROM sym s1 JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b
        |  GROUP BY 1, 2),
        |nonadj AS (
        |  SELECT cn.a, cn.b, cn.cn FROM cn
        |  LEFT JOIN und ON cn.a = und.a AND cn.b = und.b
        |  WHERE und.a IS NULL)
        |SELECT n.a, n.b, n.cn, da.deg AS deg_a, db.deg AS deg_b,
        |  CAST((1000000 * n.cn) // (da.deg + db.deg - n.cn) AS BIGINT)
        |    AS jaccard_ppm
        |FROM nonadj n JOIN deg da ON n.a = da.n
        |              JOIN deg db ON n.b = db.n""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
