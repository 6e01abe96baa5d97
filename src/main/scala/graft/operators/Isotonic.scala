package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (PAV) calibration — the monotone regression scikit-learn
  * fits before Platt scaling when the reliability curve (a53) shows a
  * non-monotone outcome rate. The pool-adjacent-violators SOLUTION is
  * stated here by its minimax identity (Robertson, Wright & Dykstra
  * 1988, §1.2):
  *
  *   fit(i) = max_{j ≤ i} min_{k ≥ i} mean(y[j..k])
  *
  * which is pure relational algebra over the BINNED table: prefix
  * sums, a (j−1, k) interval cube, and two argmin/argmax windows — no
  * sequential pooling loop, so it replays as plain SQL. The classic
  * stack algorithm is the SPEC's job (IsotonicSpec cross-checks it);
  * the engine ships the closed form.
  *
  * Exactness: interval means stay (num, den) BIGINT pairs; windows
  * order by the IEEE double num/den (identical in both engines from
  * identical BIGINTs) with the interval endpoint as tie-break, and the
  * published fit is floor micro-units (1e6·num div den, operands
  * non-negative). Scale: rows collapse onto [[Bins]] rank-equal
  * buckets first (one count-table pass, the a53 layout), so the cube
  * is Bins³ ≤ 8000 CELLS regardless of corpus size — the fact table
  * is touched exactly once.
  */
object Isotonic {

  val Bins = 20
  val Ppm = 1000000L

  private val q = Q(
    "a59_isotonic_calibration",
    (s, d) => {
      val o = Tables(s, d).orders.select(
        col("o_totalprice").as("score"),
        (col("o_orderpriority") === "1-URGENT").cast("long").as("y"))
      val counts = o.groupBy("score").agg(count(lit(1)).as("c"))
      val wS = Window.orderBy("score")
      val ranked = counts.withColumn("cum",
        sum(col("c")).over(wS.rowsBetween(Window.unboundedPreceding, 0)))
      val n = o.agg(count(lit(1)).as("n"))
      val bins = o.join(ranked.select("score", "cum"), "score")
        .crossJoin(broadcast(n))
        .withColumn("bin", expr(s"($Bins * cum + n - 1) div n") - 1L)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum(col("y")).as("pos"))
      val wB = Window.orderBy("bin")
      val pref = bins.select(col("bin"),
          sum(col("n_b")).over(wB.rowsBetween(
            Window.unboundedPreceding, 0)).as("cc"),
          sum(col("pos")).over(wB.rowsBetween(
            Window.unboundedPreceding, 0)).as("pp"))
        .union(s.range(1).select(lit(-1L).as("bin"),
          lit(0L).as("cc"), lit(0L).as("pp")))
      val lo = pref.select(col("bin").as("jm1"), col("cc").as("c0"),
        col("pp").as("p0"))
      val hi = pref.filter(col("bin") >= 0)
        .select(col("bin").as("k"), col("cc").as("c1"), col("pp").as("p1"))
      val cand = bins.select(col("bin"), col("n_b"), col("pos"))
        .join(broadcast(lo), col("jm1") < col("bin"))
        .join(broadcast(hi), col("k") >= col("bin"))
        .select(col("bin"), col("n_b"), col("pos"), col("jm1"), col("k"),
          (col("p1") - col("p0")).as("num"),
          (col("c1") - col("c0")).as("den"))
        .withColumn("frac",
          col("num").cast("double") / col("den").cast("double"))
      val wMin = Window.partitionBy("bin", "jm1")
        .orderBy(col("frac").asc, col("k").asc)
      val inner = cand.withColumn("rn", row_number().over(wMin))
        .filter(col("rn") === 1).drop("rn", "k")
      val wMax = Window.partitionBy("bin")
        .orderBy(col("frac").desc, col("jm1").asc)
      inner.withColumn("rn", row_number().over(wMax))
        .filter(col("rn") === 1)
        .select(col("bin"), col("n_b"), col("pos"),
          col("num"), col("den"),
          expr(s"($Ppm * num) div den").as("fit_ppm"))
    },
    Some(
      s"""WITH o AS (
         |  SELECT o_totalprice AS score,
         |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
         |      AS y
         |  FROM orders),
         |counts AS (SELECT score, count(*) AS c FROM o GROUP BY 1),
         |ranked AS (
         |  SELECT score,
         |    CAST(sum(c) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM counts),
         |n AS (SELECT count(*) AS n FROM o),
         |bins AS (
         |  SELECT ($Bins * r.cum + n.n - 1) // n.n - 1 AS bin,
         |    count(*) AS n_b, CAST(sum(o.y) AS BIGINT) AS pos
         |  FROM o JOIN ranked r ON o.score = r.score CROSS JOIN n
         |  GROUP BY 1),
         |pref AS (
         |  SELECT bin,
         |    CAST(sum(n_b) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cc,
         |    CAST(sum(pos) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS pp
         |  FROM bins
         |  UNION ALL SELECT -1, 0, 0),
         |cand AS (
         |  SELECT b.bin, b.n_b, b.pos, l.bin AS jm1, h.bin AS k,
         |    h.pp - l.pp AS num, h.cc - l.cc AS den,
         |    CAST(h.pp - l.pp AS DOUBLE) / CAST(h.cc - l.cc AS DOUBLE)
         |      AS frac
         |  FROM bins b
         |  JOIN pref l ON l.bin < b.bin
         |  JOIN pref h ON h.bin >= b.bin),
         |inner_min AS (
         |  SELECT * FROM (
         |    SELECT bin, n_b, pos, jm1, num, den, frac,
         |      row_number() OVER (PARTITION BY bin, jm1
         |        ORDER BY frac ASC, k ASC) AS rn
         |    FROM cand)
         |  WHERE rn = 1),
         |outer_max AS (
         |  SELECT * FROM (
         |    SELECT bin, n_b, pos, num, den,
         |      row_number() OVER (PARTITION BY bin
         |        ORDER BY frac DESC, jm1 ASC) AS rn
         |    FROM inner_min)
         |  WHERE rn = 1)
         |SELECT CAST(bin AS BIGINT) AS bin, n_b, pos, num, den,
         |  CAST(($Ppm * num) // den AS BIGINT) AS fit_ppm
         |FROM outer_max""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
