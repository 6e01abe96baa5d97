package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Two-sample Poisson rate test — the COUNT-metric companion to
  * a34's mean test and a41's proportion CI: did the error rate per
  * calendar day change between the first and second halves of the
  * stream? Score test under H₀ (equal rates, unequal exposures):
  *
  *   p̂ = (x₁+x₂)/(d₁+d₂),
  *   z = (x₁/d₁ − x₂/d₂) / √( p̂·(1/d₁ + 1/d₂) )
  *
  * Counts and exposures are exact BIGINT from ONE conditional
  * aggregate (the calendar midpoint folds in as a CASE, the a77
  * split); z is a fixed IEEE chain. The rate ratio ships as exact
  * ppm beside it.
  */
object PoissonRates {

  private val Ppm = 1000000L

  private val q = Q(
    "a85_poisson_rates",
    (s, d) => {
      val e = Tables(s, d).events
        .select(to_date(col("ts")).as("day"), col("event_type"))
      val bounds = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val agg = e.crossJoin(broadcast(bounds))
        .select((col("day") <= date_add(col("d0"),
          expr("cast(datediff(d1, d0) div 2 as int)"))).as("h1"),
          col("event_type"), col("day"),
          col("d0"), col("d1"))
        .agg(
          sum(when(col("h1") && col("event_type") === "error", 1L)
            .otherwise(0L)).as("x1"),
          sum(when(!col("h1") && col("event_type") === "error", 1L)
            .otherwise(0L)).as("x2"),
          (max(expr("datediff(d1, d0) div 2")) + 1L).as("dd1"),
          (max(expr("datediff(d1, d0)")) -
            max(expr("datediff(d1, d0) div 2"))).as("dd2"))
      val r1 = col("x1").cast("double") / col("dd1").cast("double")
      val r2 = col("x2").cast("double") / col("dd2").cast("double")
      val ph = (col("x1") + col("x2")).cast("double") /
        (col("dd1") + col("dd2")).cast("double")
      agg.select(col("x1"), col("x2"), col("dd1").as("d1"),
        col("dd2").as("d2"),
        expr(s"($Ppm * x1 * dd2) div (x2 * dd1)").as("rate_ratio_ppm"),
        round((r1 - r2) / sqrt(ph * (lit(1.0) / col("dd1").cast("double")
          + lit(1.0) / col("dd2").cast("double"))), 6).as("z"))
    },
    Some(
      s"""WITH e AS (
         |  SELECT CAST(ts AS DATE) AS day, event_type FROM events),
         |bounds AS (
         |  SELECT min(day) AS d0, max(day) AS d1 FROM e),
         |agg AS (
         |  SELECT
         |    CAST(sum(CASE WHEN day <= d0
         |        + CAST(date_diff('day', d0, d1) // 2 AS INTEGER)
         |        AND event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS x1,
         |    CAST(sum(CASE WHEN day > d0
         |        + CAST(date_diff('day', d0, d1) // 2 AS INTEGER)
         |        AND event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS x2,
         |    CAST(max(date_diff('day', d0, d1) // 2) + 1 AS BIGINT)
         |      AS dd1,
         |    CAST(max(date_diff('day', d0, d1))
         |      - max(date_diff('day', d0, d1) // 2) AS BIGINT) AS dd2
         |  FROM e CROSS JOIN bounds)
         |SELECT x1, x2, dd1 AS d1, dd2 AS d2,
         |  ($Ppm * x1 * dd2) // (x2 * dd1) AS rate_ratio_ppm,
         |  round((CAST(x1 AS DOUBLE) / CAST(dd1 AS DOUBLE)
         |      - CAST(x2 AS DOUBLE) / CAST(dd2 AS DOUBLE))
         |    / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(dd1 + dd2 AS DOUBLE))
         |      * (1.0 / CAST(dd1 AS DOUBLE) + 1.0 / CAST(dd2 AS DOUBLE))),
         |    6) AS z
         |FROM agg""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
