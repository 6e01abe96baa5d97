package graft.similarity

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Semantic decontamination — the third member of the decontamination
  * trio: `d_decontaminate` catches EXACT n-gram leakage,
  * `t_rouge_decontaminate` graded near-verbatim leakage, and this row
  * catches PARAPHRASE leakage (benchmark items rewritten into training
  * data), which only an embedding-space test can see. Every corpus
  * vector is scored by its max cosine against the benchmark set and
  * flagged above a threshold.
  *
  * Scale shape: the benchmark is small BY DEFINITION (eval suites are
  * thousands of items), so it broadcasts and the corpus is touched once,
  * map-only — the same plan as `d_decontaminate`'s n-gram broadcast.
  * The max-per-corpus-vector aggregate is map-side combinable. Cosines
  * round to 4 dp (the ann_brute parity contract) before the max and the
  * threshold test.
  */
object SemanticDecon {

  /** Benchmark = the first vectors by id (stand-in for an eval suite's
    * embedded items); flag threshold on max benchmark cosine.
    */
  val BenchSize = 20
  val Threshold = 0.35

  private val q = Q(
    "d_semantic_decontaminate",
    (s, d) => {
      val e = SimilarityQueries.withNorm(Tables(s, d).embeddings)
      val bench = broadcast(e.filter(col("vec_id") < BenchSize)
        .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
          col("nrm").as("b_nrm")))
      e.filter(col("vec_id") >= BenchSize)
        .join(bench)
        .select(col("vec_id"),
          round(SimilarityQueries.dot(col("embedding"), col("b_emb")) /
            (col("nrm") * col("b_nrm")), 4).as("cos"))
        .groupBy("vec_id")
        .agg(max(col("cos")).as("max_bench_cos"))
        .select(col("vec_id"), col("max_bench_cos"),
          (col("max_bench_cos") >= Threshold).as("contaminated"))
    },
    Some(
      s"""WITH en AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bench AS (SELECT vec_id AS b_id, v AS bv FROM en
         |          WHERE vec_id < $BenchSize),
         |scored AS (
         |  SELECT en.vec_id,
         |    round(list_cosine_similarity(en.v, bench.bv), 4) AS cos
         |  FROM en CROSS JOIN bench WHERE en.vec_id >= $BenchSize)
         |SELECT vec_id, max(cos) AS max_bench_cos,
         |  max(cos) >= $Threshold AS contaminated
         |FROM scored GROUP BY vec_id""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
