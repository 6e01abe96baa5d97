package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form OLS on noiseless lines: the fit must recover the exact
  * generating coefficients per group.
  */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("per-group slope and intercept recover the generating line") {
    val dir = java.nio.file.Files.createTempDirectory("ols").toString
    // group A: y_cents = 2x + 500; group B: y_cents = -3x + 10000
    val rows = (0 until 50).flatMap { x =>
      val date = java.time.LocalDate.of(1992, 1, 1).plusDays(x)
      Seq(("A", date.toString, (2 * x + 500) / 100.0),
        ("B", date.toString, (-3 * x + 10000) / 100.0))
    }
    rows.toDF("o_orderpriority", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val q = graft.Registry.all.find(_.name == "a29_groupwise_ols").get
    val got = q.run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("A") == ((2.0, 500.0)))
    assert(got("B") == ((-3.0, 10000.0)))
  }
}
