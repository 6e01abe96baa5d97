package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants and direct recomputes for batch 30. */
class Round5Batch30Spec extends SparkSpec {

  test("cohort ltv: matches direct per-cohort cumulative recompute") {
    val rows = graft.Tables(spark, sf("sf0.001")).orders
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val cohortOf = rows.groupBy(_._1).map { case (k, os) =>
      k -> os.map(_._2).min }
    val members = cohortOf.values.groupBy(identity).map {
      case (c, vs) => c -> vs.size }
    val cellRev = rows.groupBy(r => (cohortOf(r._1), r._2 - cohortOf(r._1)))
      .map { case (k, os) => k -> os.map(_._3).sum }
    val got = Registry.byName("e_cohort_ltv")
      .run(spark, sf("sf0.001")).collect()
      .map(r => ((r.getAs[Long]("cohort"), r.getAs[Long]("age")),
        (r.getAs[Long]("members"), r.getAs[Double]("ltv_per_member"))))
      .toMap
    assert(got.size == cellRev.size)
    cellRev.keys.foreach { case (c, a) =>
      val (m, ltv) = got((c.toLong, a.toLong))
      assert(m == members(c), s"cohort $c members")
      val cum = (0 to a).map(aa => cellRev.getOrElse((c, aa), 0.0)).sum
      assert(math.abs(ltv - cum / m) < 0.02, s"cell ($c,$a)")
    }
    // LTV curves are monotone within a cohort
    val byCohort = got.toSeq.groupBy(_._1._1)
    byCohort.values.foreach { cells =>
      val curve = cells.sortBy(_._1._2).map(_._2._2)
      assert(curve.sliding(2).forall {
        case Seq(x, y) => y >= x - 1e-9; case _ => true })
    }
  }

  test("streaming dropDuplicatesWithinWatermark: doubled stream dedups to batch distinct") {
    val got = Registry.byName("d_streaming_dropdup_ttl_parity")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val expected = graft.Tables(spark, sf("sf0.001")).events
      .groupBy("event_type")
      .agg(countDistinct(col("event_id")).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }
}
