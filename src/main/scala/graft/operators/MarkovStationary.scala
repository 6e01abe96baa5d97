package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stationary distribution of the user-journey Markov chain — the
  * long-run "where do users spend their time" vector that
  * e_event_transitions' one-step matrix only hints at (and the
  * removal-attribution row's chain, solved for its fixed point):
  * π = πP by power iteration, 20 steps from uniform on the
  * |event-types|² transition matrix.
  *
  * Exactness discipline: P's cells are exact-count ratios (one IEEE
  * divide each); every π update multiplies 5 doubles and sums them
  * through DECIMAL(38,18) casts, so the iteration is bit-identical
  * regardless of partitioning — and the DuckDB oracle replays all 20
  * steps as chained CTEs (the a60_ipf_raking discipline).
  *
  * Shape: ONE fact-table window+aggregate builds the 25-cell matrix;
  * the 20 iterations run on 5-row frames with a lineage cut each
  * step. At 100 TB the chain costs one scan — the fixed point is
  * cell-bounded, like every spine/grid statistic in this engine.
  */
object MarkovStationary {

  private val Iters = 20

  private val q = Q(
    "e_markov_stationary",
    (s, d) => {
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val trans = ev
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("c"))
      val p = trans
        .withColumn("r", sum(col("c")).over(Window.partitionBy("src")))
        .select(col("src"), col("dst"),
          (col("c").cast("double") / col("r").cast("double")).as("p"))
        .localCheckpoint(false)
      val states = p.select(col("src").as("state")).distinct()
        .localCheckpoint(false)
      val nStates = lit(5.0)
      var pi = states.select(col("state"),
        (lit(1.0) / nStates).as("pi"))
      for (_ <- 1 to Iters) {
        pi = pi.join(p, pi("state") === p("src"))
          .groupBy(col("dst").as("state"))
          .agg(sum((col("pi") * col("p")).cast("decimal(38,18)"))
            .cast("double").as("pi"))
          .localCheckpoint(false)
      }
      pi.select(col("state"), round(col("pi"), 9).as("pi"))
        .orderBy("state")
    },
    Some {
      val steps = (1 to Iters).map { i =>
        s"""pi$i AS (
           |  SELECT p.dst AS state,
           |    CAST(sum(CAST(pi${i - 1}.pi * p.p AS DECIMAL(38,18)))
           |      AS DOUBLE) AS pi
           |  FROM pi${i - 1} JOIN p ON pi${i - 1}.state = p.src
           |  GROUP BY 1)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (
         |  SELECT user_id, event_type, ts, event_id,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS nxt
         |  FROM events),
         |trans AS (
         |  SELECT event_type AS src, nxt AS dst, count(*) AS c
         |  FROM ev WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |p AS (
         |  SELECT src, dst,
         |    CAST(c AS DOUBLE) / CAST(CAST(sum(c)
         |      OVER (PARTITION BY src) AS BIGINT) AS DOUBLE) AS p
         |  FROM trans),
         |pi0 AS (
         |  SELECT DISTINCT src AS state,
         |    CAST(1.0 AS DOUBLE) / CAST(5.0 AS DOUBLE) AS pi FROM p),
         |$steps
         |SELECT state, round(pi, 9) AS pi FROM pi$Iters
         |ORDER BY state""".stripMargin
    },
  )

  def all: Seq[Q] = Seq(q)
}
