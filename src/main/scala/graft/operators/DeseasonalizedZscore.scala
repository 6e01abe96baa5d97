package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Deseasonalized anomaly detection — the composition w12's rolling
  * z-score needs BEFORE it can be trusted on seasonal traffic: divide
  * each day by its month-of-year index (w32's profile), THEN z-score
  * the residual series against its own global moments. A raw z-score
  * flags every December as anomalous; the deseasonalized one flags
  * only days abnormal FOR their season.
  *
  * Month indices are exact rationals from the same spine pass; the
  * residual moments fold decimal-stable; each day's flag is a fixed
  * IEEE chain. Demonstrates operator composition staying one-pass:
  * spine → 12-row profile → broadcast back over the spine.
  *
  * Shape: ONE fact agg to the day spine (checkpointed, reused by the
  * profile, the moments and the scoring pass), 12-row + 1-row
  * broadcasts. One corpus scan at any scale.
  */
object DeseasonalizedZscore {

  private val q = Q(
    "w33_deseasonalized_zscore",
    (s, d) => {
      val daily = Tables(s, d).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("y"))
        .localCheckpoint(false)
      val grand = daily.agg(sum(col("y")).as("ty"), count(lit(1)).as("td"))
      val idx = daily.groupBy(month(col("day")).cast("long").as("m"))
        .agg(sum(col("y")).as("my"), count(lit(1)).as("md"))
        .crossJoin(broadcast(grand))
        .select(col("m"), expr(
          "(CAST(my AS DOUBLE) / CAST(md AS DOUBLE)) " +
            "/ (CAST(ty AS DOUBLE) / CAST(td AS DOUBLE))").as("sidx"))
      val resid = daily
        .join(broadcast(idx), month(col("day")).cast("long") === col("m"))
        .select(col("day"), col("y"),
          expr("CAST(y AS DOUBLE) / sidx").as("r"))
        .localCheckpoint(false)
      val mom = resid.agg(count(lit(1)).as("n"),
        graft.util.Stable.dsum(col("r"), 6).as("sr"),
        graft.util.Stable.dsum(col("r") * col("r"), 4).as("srr"))
        .withColumn("mu", expr("sr / CAST(n AS DOUBLE)"))
        .withColumn("sd", expr(
          "sqrt((srr - sr * sr / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))"))
        .select("mu", "sd")
      resid.crossJoin(broadcast(mom))
        .select(col("day"), col("y"), round(col("r"), 4).as("deseason"),
          round(expr("(r - mu) / sd"), 6).as("z"),
          (abs(expr("(r - mu) / sd")) > 3.0).as("is_anomaly"))
    },
    Some(
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
        |  FROM orders GROUP BY 1),
        |grand AS (
        |  SELECT CAST(sum(y) AS BIGINT) AS ty, count(*) AS td FROM daily),
        |idx AS (
        |  SELECT CAST(month(day) AS BIGINT) AS m,
        |    (CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |      / (CAST(ty AS DOUBLE) / CAST(td AS DOUBLE)) AS sidx
        |  FROM daily CROSS JOIN grand GROUP BY month(day), ty, td),
        |resid AS (
        |  SELECT day, y, CAST(y AS DOUBLE) / sidx AS r
        |  FROM daily JOIN idx ON CAST(month(day) AS BIGINT) = m),
        |mom AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(r AS DECIMAL(30,6))) AS DOUBLE) AS sr,
        |    CAST(sum(CAST(r * r AS DECIMAL(30,4))) AS DOUBLE) AS srr
        |  FROM resid),
        |mom2 AS (
        |  SELECT sr / CAST(n AS DOUBLE) AS mu,
        |    sqrt((srr - sr * sr / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS sd
        |  FROM mom)
        |SELECT day, y, round(r, 4) AS deseason,
        |  round((r - mu) / sd, 6) AS z,
        |  abs((r - mu) / sd) > 3.0 AS is_anomaly
        |FROM resid CROSS JOIN mom2""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
