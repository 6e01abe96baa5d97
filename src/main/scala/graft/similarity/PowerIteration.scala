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
  * d² totals) — and the iteration then runs entirely on the d×d = 64×64
  * matrix, metadata-scale frames that never touch the corpus again.
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

  /** Exact order-independent sum at precision 18: decimals with ≤ 18
    * digits ride Spark's compact-Long fast path (precision 38 falls to
    * BigDecimal per element — measured 2× on the 20M-product Gram
    * build). 6 integer digits bound the accumulated magnitudes up to
    * ~10⁶-vector corpora per partial; beyond that, raise the precision
    * or pre-aggregate per shard.
    */
  private def dec(c: org.apache.spark.sql.Column) =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, ProdScale)))
      .cast("double")

  /** @return (i, loading, eigenvalue): the normalised principal
    *   direction (max-norm) and the dominant-eigenvalue estimate (the
    *   final iteration's scaling factor).
    */
  def topComponent(embeddings: DataFrame): DataFrame = {
    val x = embeddings.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "xi")))
      .select(col("vec_id"), col("i"), col("xi").cast("double").as("xi"))
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
    val gHalf = x.alias("a")
      .join(x.alias("b"), col("a.vec_id") === col("b.vec_id") &&
        col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(expr(s"CAST(round((a.xi * b.xi) * ${GramUnit}e0) AS BIGINT)"))
        .as("gu"))
    val g = gHalf
      .unionAll(gHalf.filter(col("i") < col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("gu")))
      .select(col("i"), col("j"),
        (col("gu").cast("double") / lit(GramUnit.toDouble)).as("g"))
      .localCheckpoint(true)
    var v: DataFrame = g.sparkSession.range(Dim)
      .select(col("id").cast("int").as("i"),
        when(col("id") === 0, 1.0).otherwise(0.0).as("v"))
    var m: DataFrame = null
    for (_ <- 1 to Iterations) {
      val y = g.join(v.select(col("i").as("j"), col("v")), "j")
        .groupBy("i").agg(dec(col("g") * col("v")).as("y"))
      m = y.agg(max(abs(col("y"))).as("m"))
      v = y.crossJoin(broadcast(m)).select(col("i"),
        (col("y") / col("m")).as("v"))
      // PageRank's rule applies verbatim: cut the linear chain each
      // round or hand Catalyst an exponentially growing join tree
      v = v.localCheckpoint(false)
    }
    v.crossJoin(broadcast(m))
      .select(col("i"), round(col("v"), 6).as("loading"),
        round(col("m"), 6).as("eigenvalue"))
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
