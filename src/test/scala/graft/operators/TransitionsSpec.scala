package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Markov transition semantics: counts follow per-user event order,
  * user boundaries are never crossed, probabilities are exact ppm.
  */
class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  test("transition counts and ppm probabilities") {
    val dir = java.nio.file.Files.createTempDirectory("tr").toString
    // user 1: A B A B A C  → A→B ×2, B→A ×2, A→C ×1
    // user 2: C A          → C→A ×1 (no cross-user A→C)
    val ev = Seq(
      (1L, 1L, "A"), (2L, 1L, "B"), (3L, 1L, "A"), (4L, 1L, "B"),
      (5L, 1L, "A"), (6L, 1L, "C"), (7L, 2L, "C"), (8L, 2L, "A"))
    ev.map { case (i, u, t) => (i, u, t, i * 1000000000L) }
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val q = graft.Registry.all.find(_.name == "e_event_transitions").get
    val got = q.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("A", "B")) == ((2L, 666666L)))
    assert(got(("A", "C")) == ((1L, 333333L)))
    assert(got(("B", "A")) == ((2L, 1000000L)))
    assert(got(("C", "A")) == ((1L, 1000000L)))
    assert(got.size == 4)
  }
}
