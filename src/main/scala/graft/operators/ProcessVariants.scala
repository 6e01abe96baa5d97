package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Process-mining variant analysis — the directly-follows graph
  * (e_event_transitions) says which STEPS happen; variants say which
  * WHOLE PATHS users actually take: each user's ordered event-type
  * trace (capped at [[MaxTrace]] steps, the standard guard against
  * unbounded traces) becomes a variant string, and the top variants
  * with cumulative coverage are the "80% of journeys are these 7
  * flows" readout every process-mining tool leads with.
  *
  * Determinism: traces order by (ts, event_id) — a total order — and
  * the per-user assembly sorts by the row number INSIDE the collected
  * array (collect_list order is partition-dependent; the sort is what
  * makes it exact). Scale: one user-keyed window + one user agg +
  * a variant-keyed count; the top-20 and its coverage window run on
  * 20 rows. Shuffles carry type strings only after the ≤20-step cap.
  */
object ProcessVariants {

  val MaxTrace = 20
  val TopN = 20
  val Ppm = 1000000L

  private val q = Q(
    "e_process_variants",
    (s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      val traces = Tables(s, d).events
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= MaxTrace)
        .groupBy("user_id")
        .agg(concat_ws(">", transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          p => p.getField("event_type"))).as("variant"))
      val counts = traces.groupBy("variant")
        .agg(count(lit(1)).as("n_traces"))
      val total = traces.agg(count(lit(1)).as("n_total"))
      val top = counts
        .orderBy(col("n_traces").desc, col("variant").asc)
        .limit(TopN)
      val wCum = Window.orderBy(col("n_traces").desc, col("variant").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      top.crossJoin(broadcast(total))
        .select(col("variant"), col("n_traces"),
          expr(s"($Ppm * n_traces) div n_total").as("share_ppm"),
          expr(s"($Ppm * sum(n_traces) over (order by n_traces desc, " +
            "variant asc rows between unbounded preceding and " +
            s"current row)) div n_total").as("cum_share_ppm"))
    },
    Some(
      s"""WITH ordered AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn
         |  FROM events),
         |traces AS (
         |  SELECT user_id,
         |    string_agg(event_type, '>' ORDER BY rn) AS variant
         |  FROM ordered WHERE rn <= $MaxTrace GROUP BY 1),
         |counts AS (
         |  SELECT variant, count(*) AS n_traces FROM traces GROUP BY 1),
         |total AS (SELECT count(*) AS n_total FROM traces),
         |top AS (
         |  SELECT variant, n_traces FROM counts
         |  ORDER BY n_traces DESC, variant ASC LIMIT $TopN)
         |SELECT variant, n_traces,
         |  CAST(($Ppm * n_traces) // n_total AS BIGINT) AS share_ppm,
         |  CAST(($Ppm * sum(n_traces) OVER (ORDER BY n_traces DESC,
         |      variant ASC ROWS BETWEEN UNBOUNDED PRECEDING AND
         |      CURRENT ROW)) // n_total AS BIGINT) AS cum_share_ppm
         |FROM top CROSS JOIN total""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
