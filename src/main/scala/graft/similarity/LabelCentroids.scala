package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-based outlier scoring against the vector's own group
  * centroid — the curation move that drops mislabelled / off-topic
  * items from a training set: score = cos(v, centroid(label)), flag
  * below a threshold.
  *
  * Scale shape: the centroid build is the IVF refinement shape
  * (posexplode + (label, pos) partial agg — the shuffle is
  * |labels|×dim rows, map-side combined, decimal-stable so the
  * centroid is partition-order-independent); scoring joins ONE
  * broadcast row per label back to the corpus — the corpus never
  * shuffles. Same replayability as the IVF family: hash-exact SQL
  * oracle via explicit left-associative dot products.
  */
object LabelCentroids {

  def labelCentroidScores(e: DataFrame, threshold: Double = 0.0): DataFrame = {
    import graft.functions.VectorOps.dot
    val cent = e
      .select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos")
      .agg((graft.util.Stable.dsum(col("col").cast("double"), 9)
        / count(lit(1))).as("x"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("x")))).as("px"))
      .select(col("label"),
        transform(col("px"), p => p.getField("x")).as("centroid"))
    e.join(broadcast(cent), "label")
      .select(col("vec_id"), col("label"),
        round(dot(col("embedding"), col("centroid")) /
          (sqrt(dot(col("embedding"), col("embedding"))) *
            sqrt(dot(col("centroid"), col("centroid")))), 4).as("cos"))
      .withColumn("is_outlier", col("cos") < threshold)
  }

  private val q = Q(
    "sim_label_centroid_outliers",
    (s, d) => labelCentroidScores(Tables(s, d).embeddings),
    Some {
      val dvc = SimilarityQueries.dotSql("e.v", "c.c", 64)
      val dvv = SimilarityQueries.dotSql("e.v", "e.v", 64)
      val dcc = SimilarityQueries.dotSql("c.c", "c.c", 64)
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |rf AS (SELECT label, p.pos,
         |         CAST(sum(CAST(e.v[p.pos] AS DECIMAL(30,9))) AS DOUBLE)
         |           / count(*) AS x
         |       FROM e, LATERAL (SELECT unnest(range(1, 65)) AS pos) p
         |       GROUP BY label, p.pos),
         |c AS (SELECT label, list(x ORDER BY pos) AS c FROM rf
         |      GROUP BY label)
         |SELECT vec_id, label,
         |  round(($dvc) / (sqrt($dvv) * sqrt($dcc)), 4) AS cos,
         |  round(($dvc) / (sqrt($dvv) * sqrt($dcc)), 4) < 0.0 AS is_outlier
         |FROM e JOIN c USING (label)""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
