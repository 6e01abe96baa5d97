package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy distributed graph coloring (Jones & Plassmann 1993) — the
  * conflict-free batching primitive: nodes sharing an edge must not
  * act together (double-booked entity merges, co-modified partitions),
  * and a coloring IS the schedule. Per round, every uncolored node
  * whose PRIORITY beats all uncolored neighbours picks the smallest
  * colour absent from its coloured neighbourhood — an independent set
  * acts per round, so the loop needs no locks and no retries.
  * Priorities are a fixed modular permutation of the id (monotone ids
  * would make each path's tail the only local maximum and serialise
  * the rounds — the classic randomised-priority trick, deterministic
  * here). [[Rounds]] fixed rounds; nodes still uncoloured stay out of
  * the output by contract.
  *
  * Scale: per round one join of the uncoloured frontier onto the edge
  * list + a max-agg (find winners) + one bounded candidate anti-join
  * (colours ≤ [[MaxColors]], degree-bounded fixture) — BSP with a
  * lineage cut per round, chained-CTE oracle replay.
  */
object Coloring {

  val Rounds = 4
  val MaxColors = 8
  /** Same bucketed fixture discipline as d29: path + skip edges inside
    * 64-wide key buckets — degree ≤ 4, 3-colourable, dense at any sf.
    */
  val PathBucket = 64L

  /** Golden-ratio modular step (618034 ≈ 0.618·999983): a small linear
    * step like 48271 is LOCALLY MONOTONE over consecutive ids — only
    * the pre-wrap node of each ~20-id stretch is a local maximum and
    * rounds serialise (measured: 5 winners/round on 100 nodes; 24 with
    * the golden step).
    */
  def priority(c: org.apache.spark.sql.Column) =
    (c * 618034L) % 999983L

  /** @param edges canonical undirected (a, b), a < b.
    * @param nodes one-column (id).
    * @return (id, color, round) for nodes coloured within [[Rounds]].
    */
  def run(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    var colors = Seq.empty[(Long, Long, Int)].toDF("id", "color", "round")
    var uncolored = nodes.localCheckpoint(true)
    for (r <- 1 to Rounds) {
      // winners: uncoloured nodes beating every uncoloured neighbour
      val unNbr = sym
        .join(uncolored.withColumnRenamed("id", "u"), "u")
        .join(uncolored.withColumnRenamed("id", "v"), "v")
        .groupBy("u").agg(max(priority(col("v"))).as("best_nbr"))
      val winners = uncolored
        .join(unNbr.withColumnRenamed("u", "id"), Seq("id"), "left")
        .filter(col("best_nbr").isNull ||
          priority(col("id")) > col("best_nbr"))
        .select("id")
      // smallest colour not used by any coloured neighbour
      val used = sym.join(winners.withColumnRenamed("id", "u"), "u")
        .join(colors.select(col("id").as("v"), col("color")), "v")
        .select(col("u").as("id"), col("color"))
      val cand = winners
        .withColumn("color",
          explode(sequence(lit(1L), lit(MaxColors.toLong))))
      // lazy lineage cuts (r08): eager checkpoints here ran THREE
      // materialisation jobs per round on ~node-sized frames — pure
      // scheduler latency (72 stages for 4 rounds). Lazy cuts keep the
      // same per-round plan bound (the RDD still materialises once at
      // first use and is shared by every consumer) without the eager
      // round-trips; measured 2.79 → 1.87 s warm at sf0.1 (subset
      // bench), identical output.
      val picked = cand.join(used, Seq("id", "color"), "left_anti")
        .groupBy("id").agg(min(col("color")).as("color"))
        .withColumn("round", lit(r))
        .localCheckpoint(false)
      colors = colors.union(picked).localCheckpoint(false)
      uncolored = uncolored
        .join(picked.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(false)
    }
    colors
  }

  private def oracleSql: String = {
    val rounds = (1 to Rounds).map { r =>
      s"""unnbr$r AS MATERIALIZED (
         |  SELECT s.u, max((s.v * 618034) % 999983) AS best_nbr
         |  FROM sym s
         |  JOIN un${r - 1} a ON s.u = a.id
         |  JOIN un${r - 1} b ON s.v = b.id
         |  GROUP BY 1),
         |win$r AS MATERIALIZED (
         |  SELECT a.id FROM un${r - 1} a LEFT JOIN unnbr$r n ON a.id = n.u
         |  WHERE n.best_nbr IS NULL
         |     OR (a.id * 618034) % 999983 > n.best_nbr),
         |used$r AS (
         |  SELECT s.u AS id, c.color
         |  FROM sym s JOIN win$r w ON s.u = w.id
         |  JOIN col${r - 1} c ON s.v = c.id),
         |pick$r AS MATERIALIZED (
         |  SELECT w.id, min(g.g) AS color, $r AS round
         |  FROM win$r w
         |  CROSS JOIN (SELECT unnest(generate_series(1, $MaxColors))
         |              AS g) g
         |  WHERE NOT EXISTS (SELECT 1 FROM used$r u
         |    WHERE u.id = w.id AND u.color = g.g)
         |  GROUP BY 1),
         |col$r AS MATERIALIZED (
         |  SELECT id, color, round FROM col${r - 1}
         |  UNION ALL SELECT id, color, round FROM pick$r),
         |un$r AS MATERIALIZED (
         |  SELECT id FROM un${r - 1}
         |  WHERE id NOT IN (SELECT id FROM pick$r))""".stripMargin
    }.mkString(",\n")
    s"""WITH ks AS (SELECT s_suppkey AS id FROM supplier),
       |e AS (
       |  SELECT a.id AS a, b.id AS b
       |  FROM ks a JOIN ks b
       |    ON (b.id = a.id + 1 OR b.id = a.id + 2)
       |   AND a.id // $PathBucket = b.id // $PathBucket),
       |sym AS (SELECT a AS u, b AS v FROM e
       |        UNION ALL SELECT b, a FROM e),
       |col0 AS (SELECT CAST(NULL AS BIGINT) AS id,
       |  CAST(NULL AS BIGINT) AS color, CAST(NULL AS INT) AS round
       |  WHERE 1 = 0),
       |un0 AS (SELECT id FROM ks),
       |$rounds
       |SELECT id, CAST(color AS BIGINT) AS color,
       |  CAST(round AS INT) AS round
       |FROM col$Rounds""".stripMargin
  }

  private val q = Q(
    "d30_greedy_coloring",
    (s, d) => {
      val ks = Tables(s, d).supplier.select(col("s_suppkey").as("id"))
      val plus = ks.select(col("id").as("a"))
      val edges = plus
        .join(ks.select((col("id") - 1L).as("a"), col("id").as("b")), "a")
        .union(plus
          .join(ks.select((col("id") - 2L).as("a"), col("id").as("b")), "a"))
        .filter(expr(s"a div $PathBucket") === expr(s"b div $PathBucket"))
      run(edges, ks)
    },
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
