package graft.domain

import graft.similarity.SimilarityQueries.dot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D2 — ANN near-duplicate scoring over description vectors, the Spark
  * re-expression of the reference's FAISS pipeline
  * (flows/enrich/labs/deduplication/faiss_utils.py:103-166 and
  * flows/enrich/deduplication.py:72-109):
  *
  *  - temporal blocking: 8-week windows sliding by 4 weeks (W2), so each
  *    ad meets only its temporal neighbours (ref deduplication_utils
  *    .py:20-33);
  *  - candidate blocking: sign-LSH (random hyperplanes) instead of the
  *    IVF index — same role (restrict the pair space), fully
  *    distributed: an equi-shuffle on (window, bucket), never an n²;
  *  - scoring: the reference's *relative* score
  *    (mean_background_distance − d) / mean_background_distance with L1
  *    distance, background estimated against a broadcast sample (the
  *    reference uses the k_large=10000 neighbourhood mean — at corpus
  *    scale these coincide; parity is graph-level, per SURVEY §7.4);
  *  - emit pairs with score > threshold as (first_id, second_id, weight).
  */
object VectorDedup {
  val ScoreThreshold = 0.8
  val WindowLength = "56 days"
  val WindowSlide = "28 days"

  /** Deterministic pseudo-random hyperplanes (splitmix64 over (plane,
    * dim)) — reproducible across runs/partitions with no RNG state.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        var z = (p.toLong << 32 | d.toLong) + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        // map to [-1, 1)
        (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
      }
    }

  def l1(a: Column, b: Column): Column =
    graft.functions.VectorOps.l1(a, b)

  /** LSH bucket id: sign bits of the projections onto the hyperplanes
    * (nPlanes = 0 ⇒ a single bucket, i.e. no LSH blocking).
    */
  private def bucketCol(vec: Column, planes: Array[Array[Double]]): Column =
    if (planes.isEmpty) lit(0L)
    else planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** @param vectors (id, created, vector) — e.g. AdVector ⋈ RawJobAd (J1)
    * @param dim vector dimensionality (reference: 768)
    * @return duplicate links (first_id, second_id, weight), weight =
    *         relative score in (threshold, 1].
    *
    * Background-mean semantics: the reference scores each query against
    * the mean distance of its k_large nearest neighbours *within the
    * window being deduplicated* (faiss_utils.py:137-143, applied
    * per-8-week-window by deduplication.py). The distributed analog here
    * is a per-window deterministic pseudo-random sample (md5-ordered,
    * so no temporal/id bias), broadcast as one sorted array per window;
    * each row's base is the sequential-order mean of L1 distances to
    * that array — one map stage, no crossJoin row expansion, and
    * bit-deterministic across partitionings. Divergence from the
    * reference (documented): a random-sample mean rather than a
    * nearest-k mean — the reference's own docstring tunes k_large
    * toward "background", which a sample estimates without the
    * all-pairs kNN a true k_large mean needs.
    *
    * A pair met in both of its overlapping windows gets the max of its
    * per-window scores (deterministic; the reference keeps whichever
    * window it happened to process first).
    */
  def nearDuplicateLinks(vectors: DataFrame, dim: Int = 768, nPlanes: Int = 8,
      backgroundSample: Int = 64,
      threshold: Double = ScoreThreshold): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)

    // temporal blocking (W2): each ad lands in 2 overlapping windows
    val blocked = vectors
      .select(col("id"), col("vector"),
        window(col("created"), WindowLength, WindowSlide).getField("start")
          .as("win"))

    // per-window background sample, md5-ordered for determinism without
    // bias toward any id/time range; one sorted array per window
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("win").orderBy(md5(col("id").cast("string")), col("id"))
    val sample = blocked
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= backgroundSample)
      .groupBy("win")
      .agg(array_sort(collect_list(struct(col("rn"),
        col("vector").as("bg")))).as("bgs"))

    // base_i = mean L1 to the window sample, summed in rn order (exact
    // reproducibility: no float reassociation across partitionings)
    val based = blocked.join(broadcast(sample), "win")
      .withColumn("base",
        aggregate(col("bgs"), lit(0.0),
          (acc, x) => acc + l1(col("vector"), x.getField("bg"))) /
          size(col("bgs")))
      .drop("bgs")

    // candidate generation: sign-LSH buckets within each window; score
    // with the first id's per-window base, keep the max across windows
    val bucketed = based
      .withColumn("bucket", bucketCol(col("vector"), planes))
    bucketed.alias("a")
      .join(bucketed.alias("b"),
        col("a.win") === col("b.win") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("first_id"), col("b.id").as("second_id"),
        ((col("a.base") - l1(col("a.vector"), col("b.vector"))) /
          col("a.base")).as("w"))
      .filter(col("w") > threshold)
      .groupBy("first_id", "second_id")
      .agg(max(col("w")).as("weight"))
  }
}
