package graft.similarity

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Davies–Bouldin index (1979) — the second classic internal
  * clustering diagnostic beside [[Silhouette]]: per-cluster scatter
  * s_i (mean distance to own centroid) and worst-case similarity
  * R_i = max_{j≠i} (s_i + s_j)/d(c_i, c_j); low R everywhere = compact,
  * well-separated clusters. Emitted per cluster (the index is their
  * mean) so the offending cluster is visible, not just the average.
  *
  * Shares [[LabelAffinity.centroids]] (decimal-stable per-dimension
  * means) and the [[Silhouette]] L2 expansion. Scale: the corpus is
  * touched once (scatter = one broadcast-centroid join + decimal-mean
  * agg); the R matrix is |labels|² rows of pure arithmetic. Scatter
  * means go through [[Stable]] so the index is partitioning-exact.
  */
object DaviesBouldin {

  val Dim = Silhouette.Dim

  def index(e0: DataFrame, dim: Int = Dim): DataFrame = {
    val e = e0.select(col("label"),
      col("embedding").cast("array<double>").as("v"))
    val cent = LabelAffinity.centroids(e0)
      .select(col("label").as("clabel"), col("c"))
    val scat = e
      .join(broadcast(cent), col("label") === col("clabel"))
      .select(col("label"),
        sqrt(Silhouette.l2("v", "c", dim)).as("dist"))
      .groupBy("label")
      .agg((Stable.dsum(col("dist"), 9) / count(lit(1))).as("s"))
    val si = scat.select(col("label").as("i"), col("s").as("s_i"))
      .join(broadcast(cent.select(col("clabel").as("i"),
        col("c").as("ci"))), "i")
    val sj = scat.select(col("label").as("j"), col("s").as("s_j"))
      .join(broadcast(cent.select(col("clabel").as("j"),
        col("c").as("cj"))), "j")
    si.join(broadcast(sj), col("i") =!= col("j"))
      .select(col("i"), col("s_i"),
        ((col("s_i") + col("s_j")) /
          sqrt(Silhouette.l2("ci", "cj", dim))).as("rij"))
      .groupBy("i")
      .agg(max(col("s_i")).as("s_raw"), max(col("rij")).as("r_raw"))
      .select(col("i").as("label"), round(col("s_raw"), 6).as("s"),
        round(col("r_raw"), 6).as("r"))
  }

  private val q = Q(
    "sim_davies_bouldin",
    (s, d) => index(Tables(s, d).embeddings),
    Some(
      s"""WITH e AS (SELECT label, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |rf AS (SELECT label, p.pos,
         |         CAST(sum(CAST(e.v[p.pos] AS DECIMAL(30,9))) AS DOUBLE)
         |           / count(*) AS x
         |       FROM e, LATERAL (SELECT unnest(range(1, ${Dim + 1}))
         |                        AS pos) p
         |       GROUP BY label, p.pos),
         |c AS (SELECT label AS clabel, list(x ORDER BY pos) AS c FROM rf
         |      GROUP BY label),
         |scat AS (
         |  SELECT e.label,
         |    CAST(sum(CAST(sqrt(${Silhouette.l2Sql("e.v", "c.c", Dim)})
         |      AS DECIMAL(30,9))) AS DOUBLE) / count(*) AS s
         |  FROM e JOIN c ON e.label = c.clabel
         |  GROUP BY 1),
         |r AS (
         |  SELECT a.label AS i, a.s AS s_i,
         |    (a.s + b.s) / sqrt(${Silhouette.l2Sql("ca.c", "cb.c", Dim)})
         |      AS rij
         |  FROM scat a JOIN scat b ON a.label <> b.label
         |  JOIN c ca ON ca.clabel = a.label
         |  JOIN c cb ON cb.clabel = b.label)
         |SELECT i AS label, round(max(s_i), 6) AS s,
         |  round(max(rij), 6) AS r
         |FROM r GROUP BY 1""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
