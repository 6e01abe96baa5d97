package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Observed metrics (`Dataset.observe`) — Spark's zero-cost pipeline
  * telemetry: named aggregates piggyback on an existing action (no
  * second scan, no extra job) and surface through the Observation
  * handle / QueryExecutionListener. The production use is data-quality
  * counters on a write path ("how many rows did the filter drop")
  * published to monitoring WITHOUT re-reading the input; here the
  * observed counters of a quality-filter pass are themselves the
  * result, so the gate checks the instrumentation agrees with the
  * direct aggregates.
  */
object Observed {

  val MinChars = 200L

  private val q = Q(
    "a52_observed_metrics",
    (s, d) => {
      val obs = Observation()
      val filtered = Tables(s, d).documents
        .select(col("doc_id"), col("n_chars"))
        .observe(obs,
          count(lit(1)).as("n_in"),
          sum(when(col("n_chars") >= MinChars, 1L).otherwise(0L))
            .as("n_kept"),
          sum(col("n_chars").cast(
            org.apache.spark.sql.types.DataTypes.createDecimalType(18, 0)))
            .cast("long").as("chars_in"))
        .filter(col("n_chars") >= MinChars)
      // the observed metrics materialise with THIS action — the
      // filter's own pass is the only scan
      val nOut = filtered.count()
      val row = obs.get
      import s.implicits._
      Seq((row("n_in").asInstanceOf[Long],
        row("n_kept").asInstanceOf[Long],
        nOut,
        row("chars_in").asInstanceOf[Long]))
        .toDF("n_in", "n_kept", "n_out", "chars_in")
    },
    Some(
      s"""SELECT count(*) AS n_in,
         |  CAST(sum(CASE WHEN n_chars >= $MinChars THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN n_chars >= $MinChars THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_out,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_in
         |FROM documents""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
