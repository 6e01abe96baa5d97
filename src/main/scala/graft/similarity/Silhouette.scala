package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Simplified silhouette (Hruschka et al. 2004) — cluster-quality score
  * per point against label centroids: a = distance to own centroid,
  * b = distance to the nearest OTHER centroid, s = (b−a)/max(a,b) in
  * (−1, 1]. The centroid-based form is the one that ships at scale: the
  * classic silhouette's mean-pairwise-distance terms are Σ|cluster|²,
  * the simplified form is |corpus|·|labels| — same ranking power for
  * cluster-count selection (the elbow criterion the consensus-cluster
  * family needs a score for).
  *
  * Scale shape: centroid build = the usual posexplode + (label, pos)
  * map-side-combined agg (|labels|·dim shuffle rows); scoring joins the
  * TINY centroid table broadcast (×|labels| row expansion consumed by a
  * map-side partial agg, so the exchange carries one skinny
  * (vec_id, a², b²) buffer per point — linear, no pairwise anything).
  * Determinism: decimal-stable means + fixed left-assoc ‖v−c‖² folds;
  * min-of-d² ties are value-identical so min is well-defined.
  */
object Silhouette {

  val Dim = 64

  /** Fixed-order ‖v − c‖² fold, identical in Spark and the oracle. */
  private[similarity] def l2(v: String, c: String, dim: Int) =
    (1 to dim).map { i =>
      val d = expr(s"element_at($v, $i) - element_at($c, $i)")
      d * d
    }.reduceLeft(_ + _)

  private[similarity] def l2Sql(v: String, c: String, dim: Int): String =
    (1 to dim).map(i => s"(($v[$i]) - ($c[$i])) * (($v[$i]) - ($c[$i]))")
      .mkString(" + ")

  def scores(e: DataFrame, dim: Int = Dim): DataFrame = {
    val cent = LabelAffinity.centroids(e)
      .select(col("label").as("clabel"), col("c"))
    val d2 = e
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(cent))
      .withColumn("d2", l2("v", "c", dim))
      .groupBy("vec_id", "label")
      .agg(max(when(col("label") === col("clabel"), col("d2"))).as("a2"),
        min(when(col("label") =!= col("clabel"), col("d2"))).as("b2"))
    d2.select(col("vec_id"), col("label"),
      round(
        when(greatest(sqrt(col("a2")), sqrt(col("b2"))) === 0d, 0d)
          .otherwise((sqrt(col("b2")) - sqrt(col("a2"))) /
            greatest(sqrt(col("a2")), sqrt(col("b2")))), 4).as("sil"))
  }

  private val q = Q(
    "sim_silhouette",
    (s, d) => scores(Tables(s, d).embeddings),
    Some(
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |rf AS (SELECT label, p.pos,
         |         CAST(sum(CAST(e.v[p.pos] AS DECIMAL(30,9))) AS DOUBLE)
         |           / count(*) AS x
         |       FROM e, LATERAL (SELECT unnest(range(1, ${Dim + 1}))
         |                        AS pos) p
         |       GROUP BY label, p.pos),
         |c AS (SELECT label AS clabel, list(x ORDER BY pos) AS c FROM rf
         |      GROUP BY label),
         |d AS (
         |  SELECT e.vec_id, e.label, c.clabel,
         |    ${l2Sql("e.v", "c.c", Dim)} AS d2
         |  FROM e CROSS JOIN c),
         |agg AS (
         |  SELECT vec_id, label,
         |    max(CASE WHEN label = clabel THEN d2 END) AS a2,
         |    min(CASE WHEN label <> clabel THEN d2 END) AS b2
         |  FROM d GROUP BY 1, 2)
         |SELECT vec_id, label,
         |  round(CASE WHEN greatest(sqrt(a2), sqrt(b2)) = 0 THEN 0
         |        ELSE (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2))
         |        END, 4) AS sil
         |FROM agg""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
