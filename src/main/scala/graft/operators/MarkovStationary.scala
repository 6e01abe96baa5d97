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
      // Driver-side fixed point (r08, guide §5 + §1.2): the matrix is
      // |event-types|² cells — METADATA-scale at any corpus size (the
      // PowerIteration d×d-Gram precedent) — yet the 20 BSP rounds on
      // 5-row frames cost 48 stages of pure scheduler/optimizer
      // overhead (measured: 2.15 → 0.32 s full-run bench warm, probe
      // 48 → 7 stages, ~0.1 s of actual task time). The ONE
      // corpus-scale job (the
      // window+agg matrix build) stays distributed; the iteration
      // replays Spark's exact arithmetic on the driver: per term
      // double→decimal(38,18) is BigDecimal.valueOf(d).setScale(18,
      // HALF_UP) (Cast semantics), the sum exact decimal addition
      // (order-free), the result .doubleValue (correctly rounded) —
      // bit-identical to the former join+agg chain, oracle-checked at
      // sf0.01 and sf0.1.
      val cells = p.collect().map { r =>
        (r.getString(0), r.getString(1), r.getDouble(2)) }
      val d18 = (x: Double) => java.math.BigDecimal.valueOf(x)
        .setScale(18, java.math.RoundingMode.HALF_UP)
      var pi: Map[String, Double] =
        cells.map(_._1).distinct.map(_ -> 1.0 / 5.0).toMap
      for (_ <- 1 to Iters) {
        // src != null replicates the former null-unsafe equi-join
        pi = cells.filter { case (src, _, _) =>
          src != null && pi.contains(src) }
          .groupBy(_._2)
          .map { case (dst, cs) =>
            dst -> cs.map { case (src, _, pv) => d18(pi(src) * pv) }
              .reduce(_.add(_)).doubleValue
          }
      }
      val out = pi.toSeq.sortBy(_._1).map { case (st, v) =>
        (st, java.math.BigDecimal.valueOf(v)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue)
      }
      import s.implicits._
      out.toDF("state", "pi").orderBy("state")
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
