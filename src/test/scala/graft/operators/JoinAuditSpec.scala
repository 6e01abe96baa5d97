package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The explosion audit's arithmetic on a hand fixture where the join
  * cardinality is known, including keys absent from one side.
  */
class JoinAuditSpec extends SparkSpec {
  import spark.implicits._

  test("per-key products and total match the actual join cardinality") {
    val dir = java.nio.file.Files.createTempDirectory("ja").toString
    // user 1: 3 events × 2 orders = 6; user 2: 1 × 4 = 4; user 3 has
    // events but no orders — contributes nothing
    Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 3L), (6L, 3L))
      .toDF("event_id", "user_id")
      .withColumn("ts", lit(0L)).withColumn("event_type", lit("e"))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 2L), (14L, 2L), (15L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val q = graft.Registry.all.find(_.name == "j16_join_explosion_audit").get
    val rows = q.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getInt(5)))
    // actual join output = 6 + 4 = 10 rows; user 1 is the top contributor
    assert(rows.toSeq == Seq((1L, 6L, 10L, 1), (2L, 4L, 10L, 2)))
  }
}
