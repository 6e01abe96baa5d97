package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top principal direction of the embedding cloud via Gram-matrix power
  * iteration — the dimensionality-reduction / whitening primitive a
  * training pipeline runs before outlier pruning or low-rank projection
  * (PCA's first component; Halko et al. 2011 frame the randomized
  * variant, this is the deterministic power method on the d×d Gram).
  *
  * The 100 TB shape is what makes this Spark-first: the corpus is
  * touched ONCE to build G = Σ_v x_v x_vᵀ — a posexplode self-join per
  * vector keyed on vec_id (d² rows per vector, map-side combinable into
  * d² totals) — and the iteration then runs on the collected d×d =
  * 64×64 matrix, which is metadata, not data: 4096 doubles on the
  * driver, never the corpus again.
  *
  * DETERMINISM: every cross-row sum (Gram entries, each mat-vec
  * component) is an exact decimal accumulation ([[graft.util.Stable]]),
  * so accumulation order — partitioning, engine — cannot move a bit;
  * per-iteration normalisation divides by max|y| (an order-independent
  * aggregate), and each emitted float is a deterministic chain of IEEE
  * ops on identical inputs, rounded to 6 dp. The oracle replays the
  * identical 8 iterations as chained CTEs.
  */
object PowerIteration {

  val Dim = 64
  val Iterations = 8
  private val ProdScale = 12

  /** 2⁴⁰: the fixed-point unit of the Gram accumulation. */
  val GramUnit = 1L << 40

  /** @return (i, loading, eigenvalue): the normalised principal
    *   direction (max-norm) and the dominant-eigenvalue estimate (the
    *   final iteration's scaling factor).
    */
  def topComponent(embeddings: DataFrame): DataFrame = {
    // spread the corpus BEFORE the d²/2 fanout: the source may arrive in
    // few partitions (one row-group locally), and the explode multiplies
    // rows ×2080 — without the spread the whole Gram build runs on as
    // many tasks as there are input splits (measured: single-task, 2.3 s
    // warm; spread: 0.7 s). One tiny exchange of the raw vectors buys a
    // fully parallel fanout — the right trade at every scale.
    // the EXPLICIT partition count pins the spread: a count-less
    // repartition is still subject to AQE's byte-based coalescing, which
    // sees a few-hundred-KB exchange and serialises the ×2080 fanout
    // back onto one task (SCALING.md "Runtime planning")
    val x = embeddings
      .repartition(embeddings.sparkSession.sparkContext.defaultParallelism,
        col("vec_id"))
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xi")))
      .select(col("embedding"), col("i"), col("xi").cast("double").as("xi"))
    // G is symmetric: accumulate the upper triangle only (i ≤ j, half
    // the products) and mirror the d²/2 summary rows after the
    // aggregate — the mirrored entries are the SAME exact decimals, so
    // results are bit-identical to the full-square build.
    // The corpus-touching job then runs ONCE: localCheckpoint pins the
    // d²-row Gram result so the iteration loop never re-runs the scan
    // (without the cut, each of the 8 rounds re-executed the self-join
    // — measured 42.8 s vs ~1 s at sf0.1).
    // Fixed-point Gram: each product is quantised to 2⁻⁴⁰ units
    // (round-half-away in both engines) and accumulated as a native
    // BIGINT — the corpus-side sum is then a codegen long sum, ~5×
    // the decimal path's throughput, and order-independence is free.
    // The quantisation IS the spec (PageRank's integer-unit
    // discipline): the oracle replays the identical rounding, and the
    // 2⁻⁴⁰ grid is far below the iteration's 6-dp output precision.
    // Unit bound: |Σ round(xᵢxⱼ·2⁴⁰)| ≤ n·max|x|²·2⁴⁰ — safe to ~10⁵
    // vectors per corpus at max|x| ≈ 4; larger fleets shard the sum.
    // upper-triangle products straight off the vector array — chained
    // posexplodes, no self-join, no exchange before the 2080-group
    // partial agg (map-side combine collapses each task to ≤ d²/2 rows)
    val gHalf = x
      .select(col("i"), col("xi"),
        posexplode(slice(col("embedding"), col("i") + 1, lit(Dim)))
          .as(Seq("dj", "xj")))
      .select(col("i"), (col("i") + col("dj")).as("j"),
        col("xi"), col("xj").cast("double").as("xj"))
      .groupBy("i", "j")
      .agg(sum(expr(s"CAST(round((xi * xj) * ${GramUnit}e0) AS BIGINT)"))
        .as("gu"))
    // The iteration runs on the DRIVER over the collected d×d matrix
    // (the KMeans-centroid precedent: 4096 doubles is metadata, and 8
    // distributed rounds over a 64-row frame were pure scheduler
    // overhead — measured 5.1 s warm at sf0.1, vs ~1.3 s with the loop
    // local; the corpus-touching Gram build above stays distributed).
    // Every step replays Spark's own arithmetic so the result is
    // bit-identical to the former distributed loop AND to the oracle's
    // CTE chain: product in IEEE double, quantised to DECIMAL(·,12) by
    // HALF_UP (what cast-to-decimal does in both engines), summed
    // exactly, one double division per component, HALF_UP 6-dp round.
    import java.math.{BigDecimal => JBD, RoundingMode}
    val gram = Array.ofDim[Double](Dim, Dim)
    gHalf.collect().foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val gv = r.getLong(2).toDouble / GramUnit.toDouble
      gram(i)(j) = gv
      if (i != j) gram(j)(i) = gv
    }
    var v = Array.tabulate(Dim)(i => if (i == 0) 1.0 else 0.0)
    var m = 0.0
    for (_ <- 1 to Iterations) {
      val y = Array.tabulate(Dim) { i =>
        var acc = JBD.ZERO
        var j = 0
        while (j < Dim) {
          acc = acc.add(JBD.valueOf(gram(i)(j) * v(j))
            .setScale(ProdScale, RoundingMode.HALF_UP))
          j += 1
        }
        acc.doubleValue()
      }
      m = y.map(math.abs).max
      v = y.map(_ / m)
    }
    def r6(d: Double) =
      JBD.valueOf(d).setScale(6, RoundingMode.HALF_UP).doubleValue()
    val spark = embeddings.sparkSession
    import spark.implicits._
    v.zipWithIndex.map { case (vi, i) => (i, r6(vi), r6(m)) }.toSeq
      .toDF("i", "loading", "eigenvalue")
  }

  private def oracleSql: String = {
    val iters = (1 to Iterations).map { k =>
      s"""y$k AS (
         |  SELECT g.i,
         |    CAST(SUM(CAST(g.g * v.v AS DECIMAL(38,$ProdScale))) AS DOUBLE)
         |      AS y
         |  FROM g JOIN v${k - 1} v ON g.j = v.i GROUP BY 1),
         |m$k AS (SELECT max(abs(y)) AS m FROM y$k),
         |v$k AS (SELECT i, y / m AS v FROM y$k, m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH x AS (
       |  SELECT vec_id, r.i,
       |    CAST(embedding[CAST(r.i AS INT) + 1] AS DOUBLE) AS xi
       |  FROM embeddings, range(0, $Dim) r(i)),
       |g AS (
       |  SELECT a.i, b.i AS j,
       |    CAST(CAST(SUM(CAST(round((a.xi * b.xi) * $GramUnit)
       |      AS BIGINT)) AS BIGINT) AS DOUBLE) / $GramUnit AS g
       |  FROM x a JOIN x b ON a.vec_id = b.vec_id
       |  GROUP BY 1, 2),
       |v0 AS (
       |  SELECT CAST(r.i AS INT) AS i,
       |    CASE WHEN r.i = 0 THEN 1.0 ELSE 0.0 END AS v
       |  FROM range(0, $Dim) r(i)),
       |$iters
       |SELECT v.i, round(v.v, 6) AS loading, round(m.m, 6) AS eigenvalue
       |FROM v$Iterations v, m$Iterations m""".stripMargin
  }

  private val q = Q(
    "sim_pca_power",
    (s, d) => topComponent(Tables(s, d).embeddings),
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
