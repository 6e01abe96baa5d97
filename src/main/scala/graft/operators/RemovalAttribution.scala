package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Removal-effect attribution — the journey-level counterpart of
  * `e_attribution`'s positional models.
  *
  * Positional credit (first/last/linear) answers "where in the path did
  * the touch sit"; removal effect answers the counterfactual "what
  * fraction of conversions would DIE if channel c vanished". Over
  * observed journeys the two coincide in a clean closed form: a
  * conversion dies without c iff its pre-conversion path touched c, so
  *
  *     removal_effect(c) = |converting journeys touching c| / |converting journeys|
  *     share(c)          = touching(c) / Σ_c touching(c)
  *
  * — all-integer counting until two final single divisions, which
  * makes the operator bit-exact across engines with no decimal
  * scaffolding (contrast the iterative Markov-chain formulation, whose
  * float matrix powers are engine-order-dependent; on observed paths
  * it estimates this same quantity).
  *
  * Journey boundary: a user's journey runs to their FIRST purchase
  * (inclusive of same-instant touches, `ts <= first_purchase_ts`);
  * touches after it belong to the next journey and are excluded.
  *
  * Shape at scale: one shuffle of events on user_id (the first-purchase
  * agg and the touch join share it), a distinct on (user, channel) that
  * is map-side combinable, and a 4-row final window — no pairwise path
  * enumeration anywhere.
  */
object RemovalAttribution {

  private val removal = Q(
    "e_removal_attribution",
    (s, d) => {
      val e = Tables(s, d).events
      val firstPurchase = e.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts")).as("pts"))
      val touchingConv = e.filter(col("event_type") =!= "purchase")
        .join(firstPurchase, Seq("user_id"))
        .filter(col("ts") <= col("pts"))
        .select(col("user_id"), col("event_type").as("channel"))
        .distinct()
        .groupBy("channel")
        .agg(count(lit(1)).as("n_conv_touching"))
      val nConv = firstPurchase.agg(count(lit(1)).as("n_conv"))
      touchingConv.crossJoin(broadcast(nConv))
        .withColumn("tot_touching",
          sum(col("n_conv_touching")).over(
            Window.partitionBy(lit(1))))
        .select(col("channel"), col("n_conv"), col("n_conv_touching"),
          (col("n_conv_touching").cast("double") /
            col("n_conv").cast("double")).as("removal_effect"),
          (col("n_conv_touching").cast("double") /
            col("tot_touching").cast("double")).as("share"))
    },
    Some(
      """WITH p AS (
        |  SELECT user_id, min(ts) AS pts FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (
        |  SELECT DISTINCT e.user_id, e.event_type AS channel
        |  FROM events e JOIN p USING (user_id)
        |  WHERE e.event_type <> 'purchase' AND e.ts <= p.pts),
        |c AS (SELECT channel, count(*) AS n_conv_touching FROM t
        |      GROUP BY 1),
        |n AS (SELECT count(*) AS n_conv FROM p)
        |SELECT c.channel, n.n_conv, c.n_conv_touching,
        |  CAST(c.n_conv_touching AS DOUBLE) / CAST(n.n_conv AS DOUBLE)
        |    AS removal_effect,
        |  CAST(c.n_conv_touching AS DOUBLE) /
        |    CAST(sum(c.n_conv_touching) OVER () AS DOUBLE) AS share
        |FROM c CROSS JOIN n""".stripMargin),
  )

  def queries: Seq[Q] = Seq(removal)
}
