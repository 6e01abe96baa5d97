package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Growth accounting — the MAU-change decomposition every product
  * review runs (new + resurrected − churned = ΔMAU, the identity
  * that says WHERE growth came from, which e_dau_stickiness's level
  * metric cannot): per month, customers are NEW (first-ever active
  * month), RETAINED (active this month and last), RESURRECTED
  * (active this month, inactive last, seen before) or CHURNED
  * (active last month, not this).
  *
  * One distinct (customer, month) table drives everything: per-user
  * lag windows classify this-month actives; churn is last month's
  * actives anti-joined against this month's — realised as a month-
  * shifted self-join on the SAME table. All exact integer counts;
  * the spec gates the accounting identity itself.
  *
  * Shape: one distinct agg (map-side combinable) is the corpus-sized
  * step; windows partition per customer (bounded by a customer's
  * active months); the final frame is calendar-bounded.
  */
object GrowthAccounting {

  private val q = Q(
    "e_growth_accounting",
    (s, d) => {
      val um = Tables(s, d).orders
        .select(col("o_custkey").as("u"),
          (year(col("o_orderdate")).cast("long") * 12 +
            month(col("o_orderdate")).cast("long")).as("m"))
        .distinct()
        .localCheckpoint(false)
      val w = Window.partitionBy("u").orderBy("m")
      val flagged = um
        .withColumn("prev", lag(col("m"), 1).over(w))
        .withColumn("state",
          when(col("prev").isNull, "new")
            .when(col("prev") === col("m") - 1, "retained")
            .otherwise("resurrected"))
      val states = flagged.groupBy("m")
        .agg(sum(when(col("state") === "new", 1L).otherwise(0L)).as("new"),
          sum(when(col("state") === "retained", 1L).otherwise(0L))
            .as("retained"),
          sum(when(col("state") === "resurrected", 1L).otherwise(0L))
            .as("resurrected"),
          count(lit(1)).as("mau"))
      val churned = um.alias("a")
        .join(um.alias("b"),
          col("a.u") === col("b.u") && col("b.m") === col("a.m") + 1,
          "left_anti")
        .select((col("m") + 1).as("m"))
        .groupBy("m").agg(count(lit(1)).as("churned"))
      states.join(churned, Seq("m"), "left")
        .select(col("m").as("month_idx"), col("new"), col("retained"),
          col("resurrected"), coalesce(col("churned"), lit(0L))
            .as("churned"), col("mau"))
    },
    Some(
      """WITH um AS (
        |  SELECT DISTINCT o_custkey AS u,
        |    CAST(year(o_orderdate) AS BIGINT) * 12
        |      + CAST(month(o_orderdate) AS BIGINT) AS m
        |  FROM orders),
        |flagged AS (
        |  SELECT m,
        |    CASE WHEN lag(m, 1) OVER (PARTITION BY u ORDER BY m) IS NULL
        |         THEN 'new'
        |         WHEN lag(m, 1) OVER (PARTITION BY u ORDER BY m) = m - 1
        |         THEN 'retained'
        |         ELSE 'resurrected' END AS state
        |  FROM um),
        |states AS (
        |  SELECT m,
        |    CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS new,
        |    CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS retained,
        |    CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS resurrected,
        |    count(*) AS mau
        |  FROM flagged GROUP BY 1),
        |churned AS (
        |  SELECT a.m + 1 AS m, count(*) AS churned
        |  FROM um a ANTI JOIN um b ON a.u = b.u AND b.m = a.m + 1
        |  GROUP BY 1)
        |SELECT s.m AS month_idx, s.new, s.retained, s.resurrected,
        |  coalesce(c.churned, 0) AS churned, s.mau
        |FROM states s LEFT JOIN churned c ON s.m = c.m""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
