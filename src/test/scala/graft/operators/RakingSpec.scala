package graft.operators

import graft.{Registry, SparkSpec}

/** IPF property checks: the final (industry) half-sweep leaves column
  * margins on target up to floor residue, and row margins have
  * converged to within the textbook geometric tolerance.
  */
class RakingSpec extends SparkSpec {

  test("raked margins hit the Y1 targets") {
    val out = Registry.byName("a60_ipf_raking")
      .run(spark, sf("sf0.01")).collect()
    assert(out.nonEmpty)
    val t = graft.Tables(spark, sf("sf0.01"))
    val cube = RegionalShare.cells(t)
      .withColumn("y", org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col("l_shipdate")))
      .filter(org.apache.spark.sql.functions.col("y")
        .isin(Raking.Y0, Raking.Y1))
      .groupBy("region", "industry")
      .agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("y") === Raking.Y0, 1L)
            .otherwise(0L)).as("n0"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("y") === Raking.Y1, 1L)
            .otherwise(0L)).as("n1"))
      .filter(org.apache.spark.sql.functions.col("n0") > 0)
      .collect()
    val tgtInd = cube.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    val tgtReg = cube.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    val gotInd = out.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(3)).sum.toDouble / 1e6).toMap
    val gotReg = out.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(3)).sum.toDouble / 1e6).toMap
    // last half-sweep scaled industries: exact up to floor residue
    gotInd.foreach { case (k, v) =>
      assert(math.abs(v - tgtInd(k)) < 1.0, s"industry $k: $v vs ${tgtInd(k)}")
    }
    // rows converged geometrically: within 2% after 3 sweeps
    gotReg.foreach { case (k, v) =>
      val want = tgtReg(k).toDouble
      assert(math.abs(v - want) / want < 0.02, s"region $k: $v vs $want")
    }
  }
}
