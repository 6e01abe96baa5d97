package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise cosine between per-label embedding centroids — the
  * label-confusion map of an embedding space: two labels whose centroids
  * sit close are the pair a downstream classifier (or a dedup threshold
  * tuned per label) will confuse first, and a near-1 off-diagonal is the
  * signal to merge labels before training. Complements
  * [[LabelCentroids]] (which scores ROWS against their own centroid)
  * with the label×label view.
  *
  * Scale shape: the centroid build is the only corpus-touching pass —
  * posexplode + (label, pos) partial aggregation, so the shuffle is
  * |labels|·dim rows after map-side combine, never corpus-sized. The
  * pairwise stage is |labels|² on metadata-scale rows. Determinism: the
  * per-dimension mean is the decimal-stable sum (order-independent) and
  * the dot product is the same fixed left-to-right fold as every other
  * similarity oracle.
  */
object LabelAffinity {

  val Dim = 64

  /** (label, n, c) — decimal-stable per-dimension means assembled back
    * into an array, exactly the IVF/PQ refine shape.
    */
  def centroids(e: DataFrame): DataFrame =
    e.select(col("label"),
      posexplode(col("embedding").cast("array<double>")))
      .groupBy("label", "pos")
      .agg((graft.util.Stable.dsum(col("col"), 9) / count(lit(1))).as("x"),
        count(lit(1)).as("n"))
      .groupBy("label")
      .agg(max(col("n")).as("n"),
        array_sort(collect_list(struct(col("pos"), col("x")))).as("px"))
      .select(col("label"), col("n"),
        transform(col("px"), p => p.getField("x")).as("c"))

  def affinity(e: DataFrame): DataFrame = {
    val cen = centroids(e)
      .withColumn("nrm", SimilarityQueries.norm(col("c")))
    cen.alias("a")
      .join(cen.alias("b"), col("a.label") < col("b.label"))
      .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        round(SimilarityQueries.dot(col("a.c"), col("b.c")) /
          (col("a.nrm") * col("b.nrm")), 4).as("cos"))
  }

  private val q = Q(
    "sim_label_affinity",
    (s, d) => affinity(Tables(s, d).embeddings),
    Some {
      val dot = SimilarityQueries.dotSql("a.c", "b.c", Dim)
      val nrmA = SimilarityQueries.dotSql("a.c", "a.c", Dim)
      val nrmB = SimilarityQueries.dotSql("b.c", "b.c", Dim)
      s"""WITH en AS (
         |  SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
         |pe AS (
         |  SELECT label, p.i AS pos, v[p.i] AS x
         |  FROM en, LATERAL (SELECT unnest(range(1, ${Dim + 1})) AS i) p),
         |cen AS (
         |  SELECT label, pos,
         |    CAST(sum(CAST(x AS DECIMAL(30,9))) AS DOUBLE) / count(*) AS x,
         |    count(*) AS n
         |  FROM pe GROUP BY 1, 2),
         |cl AS (
         |  SELECT label, CAST(max(n) AS BIGINT) AS n,
         |    list(x ORDER BY pos) AS c
         |  FROM cen GROUP BY 1)
         |SELECT a.label AS label_a, b.label AS label_b,
         |  a.n AS n_a, b.n AS n_b,
         |  round(($dot) / (sqrt($nrmA) * sqrt($nrmB)), 4) AS cos
         |FROM cl a JOIN cl b ON a.label < b.label""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
