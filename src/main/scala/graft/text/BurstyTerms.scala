package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trending-terms (burst) detection over ingestion batches — the
  * "which skills are suddenly being asked for" query a jobs
  * observatory publishes weekly (the reference's aggregate stage
  * tracks week-over-week skill demand, `flows/aggregate/`). A term's
  * burst score in batch b is its token share there divided by its
  * share over the trailing 4 batches, Laplace-smoothed (+1 on both
  * trailing counts) so brand-new terms score without dividing by
  * zero:
  *
  *   burst_ppm = 1e6·c_tb·(T_trail + 1) div (T_b·(c_trail + 1))
  *
  * All operands non-negative, so floor `div` replays in DuckDB.
  * The trailing sums are RANGE window frames (4 PRECEDING … 1
  * PRECEDING) over the batch NUMBER — sparse (term, batch) cells get
  * correct zero-count gaps without densifying the cube.
  *
  * Scale: one token-keyed hash aggregate (map-side combinable) over
  * the corpus, then everything downstream touches the (term, batch)
  * cube, never the text; batch totals are a |batches|-row broadcast.
  * The per-term trailing window shuffles cube cells only. Top-30 is
  * TakeOrderedAndProject — no global sort.
  */
object BurstyTerms {

  val BatchSize = 50L
  val TrailBatches = 4
  val MinCount = 5L
  val TopN = 30
  val Ppm = 1000000L

  /** Shared with the streaming twin — hash-equality against the SAME
    * oracle is what proves batch/stream parity.
    */
  val oracleSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id // $BatchSize AS batch, term
       |  FROM (SELECT doc_id,
       |          unnest(string_split(lower(text), ' ')) AS term
       |        FROM documents)
       |  WHERE length(term) >= 3),
       |cells AS (
       |  SELECT term, batch, count(*) AS c FROM tok GROUP BY 1, 2),
       |batches AS (
       |  SELECT batch, count(*) AS tok FROM tok GROUP BY 1),
       |spine AS (
       |  SELECT batch, tok,
       |    CAST(coalesce(sum(tok) OVER (ORDER BY batch
       |      RANGE BETWEEN $TrailBatches PRECEDING AND 1 PRECEDING),
       |      0) AS BIGINT) AS trail_tok
       |  FROM batches),
       |trailed AS (
       |  SELECT term, batch, c,
       |    CAST(coalesce(sum(c) OVER (PARTITION BY term ORDER BY batch
       |      RANGE BETWEEN $TrailBatches PRECEDING AND 1 PRECEDING),
       |      0) AS BIGINT) AS trail_c
       |  FROM cells)
       |SELECT t.term, t.batch, t.c, t.trail_c,
       |  CAST(($Ppm * t.c * (s.trail_tok + 1))
       |    // (s.tok * (t.trail_c + 1)) AS BIGINT) AS burst_ppm
       |FROM trailed t JOIN spine s USING (batch)
       |WHERE t.c >= $MinCount
       |ORDER BY burst_ppm DESC, t.term, t.batch
       |LIMIT $TopN""".stripMargin

  def bursty(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val tok = docs
      .select(expr(s"doc_id div $BatchSize").as("batch"),
        explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) >= 3)
    val cells = tok.groupBy("term", "batch")
      .agg(count(lit(1)).as("c"))
    val batches = tok.groupBy("batch").agg(count(lit(1)).as("tok"))
    val wB = Window.orderBy("batch")
      .rangeBetween(-TrailBatches, -1)
    val spine = batches.select(col("batch"), col("tok"),
      coalesce(sum(col("tok")).over(wB), lit(0L)).as("trail_tok"))
    val wT = Window.partitionBy("term").orderBy("batch")
      .rangeBetween(-TrailBatches, -1)
    cells
      .withColumn("trail_c",
        coalesce(sum(col("c")).over(wT), lit(0L)))
      .join(broadcast(spine), "batch")
      .filter(col("c") >= MinCount)
      .select(col("term"), col("batch"), col("c"), col("trail_c"),
        expr(s"($Ppm * c * (trail_tok + 1)) div (tok * (trail_c + 1))")
          .as("burst_ppm"))
      .orderBy(col("burst_ppm").desc, col("term"), col("batch"))
      .limit(TopN)
  }

  private val q = Q(
    "t_bursty_terms",
    (s, d) => bursty(Tables(s, d).documents),
    Some(oracleSql),
  )

  def queries: Seq[Q] = Seq(q)
}
