package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked spatial radius join — the missing-family member beside
  * the equi/asof/interval joins: "every (customer, supplier) pair
  * within distance R", the shape behind store-catchment, geo-dedup and
  * location-entity matching (the reference's location lookup at
  * `ojd_daps/flows/enrich/labs/locations` joins on NAME; the radius
  * join is what it becomes once records carry coordinates).
  *
  * Determinism without trig: coordinates are synthetic integer
  * milli-degrees derived from the keys by modular arithmetic (no RNG,
  * no floats), and the predicate is planar squared distance
  * dx² + dy² ≤ R² — pure BIGINT, so the oracle replays it exactly.
  * A haversine-on-doubles variant would only change the verify
  * expression, not the plan shape.
  *
  * Scale shape — the point of the operator: instead of the n×m cross
  * join, space is cut into R×R cells; the smaller (supplier) side is
  * exploded to its 3×3 cell neighbourhood (a bounded ×9 fanout on the
  * SMALL side), and the join is a pure EQUI-join on the cell id
  * followed by the exact integer filter. Work is Σ per-cell density
  * products — linear for geographically-bounded density, the same
  * blocking argument as the LSH band join (SCALING.md).
  */
object GeoJoin {

  /** Radius in integer milli-degrees; also the grid cell edge. */
  val RadiusMilli = 3000L

  private def cust(t: Tables): DataFrame =
    t.customer.select(col("c_custkey"),
      ((col("c_custkey") * 48271L) % 180000L).as("lat"),
      ((col("c_custkey") * 69621L) % 360000L).as("lon"))

  private def supp(t: Tables): DataFrame =
    t.supplier.select(col("s_suppkey"),
      ((col("s_suppkey") * 16807L) % 180000L).as("lat"),
      ((col("s_suppkey") * 39373L) % 360000L).as("lon"))

  /** @return (c_custkey, s_suppkey, dist2) for pairs within R. */
  def radiusJoin(c: DataFrame, s: DataFrame, r: Long): DataFrame = {
    val probes = c.withColumn("cx", expr(s"lat div $r"))
      .withColumn("cy", expr(s"lon div $r"))
    val nine = s
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("s_suppkey"), col("lat").as("slat"), col("lon").as("slon"),
        (expr(s"lat div $r") + col("dx")).as("cx"),
        (expr(s"lon div $r") + col("dy")).as("cy"))
    probes.join(nine, Seq("cx", "cy"))
      .select(col("c_custkey"), col("s_suppkey"),
        ((col("lat") - col("slat")) * (col("lat") - col("slat")) +
          (col("lon") - col("slon")) * (col("lon") - col("slon")))
          .as("dist2"))
      .filter(col("dist2") <= r * r)
  }

  private val q = Q(
    "j23_geo_radius_join",
    (s, d) => {
      val t = Tables(s, d)
      radiusJoin(cust(t), supp(t), RadiusMilli)
    },
    Some(
      s"""WITH c AS (
         |  SELECT c_custkey,
         |    (c_custkey * 48271) % 180000 AS lat,
         |    (c_custkey * 69621) % 360000 AS lon
         |  FROM customer),
         |s AS (
         |  SELECT s_suppkey,
         |    (s_suppkey * 16807) % 180000 AS lat,
         |    (s_suppkey * 39373) % 360000 AS lon
         |  FROM supplier),
         |nine AS (
         |  SELECT s.s_suppkey, s.lat AS slat, s.lon AS slon,
         |    s.lat // $RadiusMilli + dx.v AS cx,
         |    s.lon // $RadiusMilli + dy.v AS cy
         |  FROM s
         |  CROSS JOIN (VALUES (-1), (0), (1)) dx(v)
         |  CROSS JOIN (VALUES (-1), (0), (1)) dy(v))
         |SELECT c.c_custkey, nine.s_suppkey,
         |  CAST((c.lat - nine.slat) * (c.lat - nine.slat)
         |     + (c.lon - nine.slon) * (c.lon - nine.slon) AS BIGINT)
         |    AS dist2
         |FROM c JOIN nine
         |  ON c.lat // $RadiusMilli = nine.cx
         | AND c.lon // $RadiusMilli = nine.cy
         |WHERE (c.lat - nine.slat) * (c.lat - nine.slat)
         |    + (c.lon - nine.slon) * (c.lon - nine.slon)
         |   <= $RadiusMilli * $RadiusMilli""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
