package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-adoption curves — the product question behind every
  * launch review: per event type, how many users touched it for the
  * FIRST time each week, and what share of the user base has adopted
  * it by then. (a22's cohort retention asks who comes back; this
  * asks how far a feature has penetrated.)
  *
  * EXACT: first-use = per-(user, type) min aggregate; weekly
  * adopters, the cumulative window and the ppm share are all BIGINT.
  * Shape: two map-side-combinable aggregates (the second reuses the
  * first's user partitioning is NOT needed — it keys by type/week,
  * |types|×|weeks| cells), one 1-row user-base broadcast.
  */
object FeatureAdoption {

  private val Ppm = 1000000L

  private val q = Q(
    "e_feature_adoption",
    (s, d) => {
      val ev = Tables(s, d).events
        .select(col("user_id"), col("event_type"),
          to_date(col("ts")).as("day"))
      val base = ev.agg(count_distinct(col("user_id")).as("n_users"))
      val firstUse = ev.groupBy("user_id", "event_type")
        .agg(min(col("day")).as("first_day"))
      val weekly = firstUse
        .groupBy(col("event_type"),
          date_trunc("week", col("first_day")).cast("date").as("week"))
        .agg(count(lit(1)).as("new_adopters"))
      weekly
        .withColumn("adopted", sum(col("new_adopters")).over(
          Window.partitionBy("event_type").orderBy("week")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(base))
        .select(col("event_type"), col("week").cast("string").as("week"),
          col("new_adopters"), col("adopted"),
          expr(s"($Ppm * adopted) div n_users").as("adoption_ppm"))
        .orderBy("event_type", "week")
    },
    Some(
      s"""WITH ev AS (
         |  SELECT user_id, event_type, CAST(ts AS DATE) AS day
         |  FROM events),
         |base AS (SELECT count(DISTINCT user_id) AS n_users FROM ev),
         |first_use AS (
         |  SELECT user_id, event_type, min(day) AS first_day
         |  FROM ev GROUP BY 1, 2),
         |weekly AS (
         |  SELECT event_type,
         |    CAST(date_trunc('week', first_day) AS DATE) AS week,
         |    count(*) AS new_adopters
         |  FROM first_use GROUP BY 1, 2),
         |c AS (
         |  SELECT event_type, week, new_adopters,
         |    CAST(sum(new_adopters) OVER (PARTITION BY event_type
         |      ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS BIGINT) AS adopted
         |  FROM weekly)
         |SELECT event_type, CAST(week AS VARCHAR) AS week,
         |  new_adopters, adopted,
         |  ($Ppm * adopted) // n_users AS adoption_ppm
         |FROM c CROSS JOIN base
         |ORDER BY event_type, week""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
