package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez's 2-approximation): pick
  * the corpus row farthest (cosine distance) from the centers chosen so
  * far, k−1 times from a deterministic seed (lowest vec_id). The
  * selected "coreset" maximises coverage diversity — the data-selection
  * counterpart to MMR re-ranking (which diversifies a retrieved top-k;
  * this diversifies the CORPUS, e.g. for annotation budgets or
  * evaluation-set construction).
  *
  * Scale shape: greedy k-center is sequential in k BY DEFINITION; the
  * distributed form keeps the corpus on executors and moves exactly one
  * argmax row to the driver per round (k rows total over the whole fit
  * — not a driver-side loop over data). Each round is one corpus scan
  * against a broadcast packed-centers row (the same zero-shuffle
  * assignment map [[KMeans]] uses) plus a TakeOrdered(1). Total cost
  * k scans — the textbook lower bound for exact greedy.
  *
  * Determinism: distances are the replayed left-to-right float fold,
  * argmax ties break on vec_id asc, so the full selection TRAJECTORY
  * replays in SQL (one CTE stage per round) and the gate hash-checks
  * every chosen center and its selection-time radius.
  */
object KCenter {

  val K = 8

  /** The k chosen centers as (rank, vec_id, radius) — radius is the
    * farthest-point distance at selection time (NULL for the seed).
    *
    * Each argmax row is collected WITH its embedding (dim values —
    * metadata-scale, the PowerIteration d×d collect precedent), so a
    * greedy round is ONE corpus scan against a packed-centers row built
    * from the driver-held k rows. Before, every round also re-filtered
    * and re-aggregated the corpus for the centers (2 extra corpus-scan
    * jobs per round — opt guide §1.2/§5). The held bytes are the stored
    * values untouched and the local relation keeps the source column
    * type, so the assignment arithmetic is bit-identical.
    */
  def fit(corpus: DataFrame, k: Int = K): Seq[(Int, Long, Option[Double])] = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val s = corpus.sparkSession
    val centSchema = StructType(Seq(StructField("cid", LongType),
      StructField("centroid", corpus.schema("embedding").dataType)))
    val seed = corpus.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("embedding")).head()
    var held = Vector[Row](Row(seed.getLong(0), seed.get(1)))
    var chosen = Vector[(Int, Long, Option[Double])]((1, seed.getLong(0), None))
    while (chosen.length < k) {
      val cents = s.createDataFrame(
        java.util.Arrays.asList(held: _*), centSchema)
      val far = SimilarityQueries
        .withNearest(corpus, SimilarityQueries.pack(cents), 1)
        .select(col("vec_id"),
          (lit(1.0) + element_at(col("lists"), 1).getField("negcos"))
            .as("mind"),
          col("embedding"))
        .orderBy(desc("mind"), asc("vec_id")).limit(1)
        .head()
      chosen = chosen :+
        ((chosen.length + 1, far.getLong(0), Some(far.getDouble(1))))
      held = held :+ Row(far.getLong(0), far.get(2))
    }
    chosen
  }

  private def resultDf(s: SparkSession, rows: Seq[(Int, Long, Option[Double])])
      : DataFrame = {
    import s.implicits._
    rows.map { case (r, id, rad) => (r, id, rad.map(x => x): Option[Double]) }
      .toDF("rank", "vec_id", "radius_raw")
      .select(col("rank"), col("vec_id"),
        round(col("radius_raw"), 4).as("radius"))
  }

  // ---- SQL replay: one CTE stage per greedy round ---------------------

  private def dotSql(a: String, b: String, dim: Int): String =
    SimilarityQueries.dotSql(a, b, dim)

  private def oracleSql(dim: Int, k: Int): String = {
    val stages = (2 to k).map { t =>
      val prevD = s"d${t - 1}"
      val dv = dotSql(s"$prevD.v", s"c$t.v", dim)
      s"""p$t AS (SELECT vec_id, mind FROM d${t - 1}
         |        ORDER BY mind DESC, vec_id LIMIT 1),
         |c$t AS (SELECT en.vec_id, en.v, en.nrm
         |        FROM en JOIN p$t USING (vec_id)),
         |d$t AS (
         |  SELECT $prevD.vec_id, $prevD.v, $prevD.nrm,
         |    least($prevD.mind,
         |      1.0 - (($dv) / ($prevD.nrm * c$t.nrm))) AS mind
         |  FROM $prevD CROSS JOIN c$t)""".stripMargin
    }.mkString(",\n")
    val dv1 = dotSql("en.v", "s1.v", dim)
    val unions = (2 to k).map(t =>
      s"""SELECT CAST($t AS INT) AS rank, p$t.vec_id,
         |  round(p$t.mind, 4) AS radius FROM p$t""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH en AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |  sqrt(${dotSql("(embedding::DOUBLE[])", "(embedding::DOUBLE[])", dim)}) AS nrm
       |  FROM embeddings),
       |s1 AS (SELECT vec_id, v, nrm FROM en ORDER BY vec_id LIMIT 1),
       |d1 AS (
       |  SELECT en.vec_id, en.v, en.nrm,
       |    1.0 - (($dv1) / (en.nrm * s1.nrm)) AS mind
       |  FROM en CROSS JOIN s1),
       |$stages
       |SELECT CAST(1 AS INT) AS rank, s1.vec_id,
       |  CAST(NULL AS DOUBLE) AS radius FROM s1
       |UNION ALL
       |$unions""".stripMargin
  }

  private val q = Q(
    "sim_kcenter_coreset",
    (s, d) => resultDf(s, fit(Tables(s, d).embeddings)),
    Some(oracleSql(dim = 64, k = K)),
  )

  def queries: Seq[Q] = Seq(q)
}
