package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** The native as-of join (logical node + strategy + sort-merge exec) must:
  *   - match the composed union+window form (`j12_asof_join`) row-for-row
  *     on the shared fixture data;
  *   - plan through [[AsOfJoinExec]] (the strategy actually claims the
  *     node) with both children sorted and clustered;
  *   - implement backward semantics exactly: greatest right time <= left
  *     time per key, equal times included, deterministic tie-break, left
  *     rows without a match dropped, null times never matching;
  *   - survive repartitioning (merge is per-partition, distribution is
  *     planner-enforced).
  */
class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def mkFrames(rows: Seq[(Long, Long, Long, String)]) = {
    // (user, tsMicros, id, kind)
    import spark.implicits._
    val df = rows.toDF("user_id", "us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val probes = df.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val quotes = df.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_event"))
    (probes, quotes)
  }

  test("backward semantics: latest at-or-before, no-match dropped") {
    val (p, v) = mkFrames(Seq(
      (1L, 100L, 10L, "view"),
      (1L, 200L, 11L, "view"),
      (1L, 200L, 12L, "purchase"),  // equal ts → view 11 matches
      (1L, 300L, 13L, "purchase"),  // latest view 11
      (2L, 500L, 20L, "purchase"),  // user 2 has no view → dropped
      (3L, 50L, 30L, "view"),
      (3L, 40L, 31L, "purchase")    // view is AFTER purchase → dropped
    ))
    val got = AsOfJoin.backward(p, v, "user_id", "v_user", "ts", "v_ts",
        rightTie = Some("v_event"))
      .select("event_id", "v_event").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((12L, 11L), (13L, 11L)))
  }

  test("tie-break on equal (key, time): largest tie column wins") {
    val (p, v) = mkFrames(Seq(
      (7L, 100L, 1L, "view"),
      (7L, 100L, 2L, "view"),   // same user, same ts — tie broken by event_id
      (7L, 150L, 9L, "purchase")
    ))
    val got = AsOfJoin.backward(p, v, "user_id", "v_user", "ts", "v_ts",
        rightTie = Some("v_event"))
      .select("v_event").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L))
  }

  test("plans through AsOfJoinExec") {
    val (p, v) = mkFrames(Seq(
      (1L, 100L, 10L, "view"), (1L, 200L, 12L, "purchase")))
    val df = AsOfJoin.backward(p, v, "user_id", "v_user", "ts", "v_ts")
    df.collect()
    val execs = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: AsOfJoinExec => e
    }
    assert(execs.nonEmpty, "strategy did not claim the AsOfJoinPlan node")
  }

  test("matches the composed j12 form on the fixture events table") {
    val dir = sf("sf0.001")
    val composed = graft.Registry.byName("j12_asof_join").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val native = graft.Registry.byName("j12b_asof_native").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native.nonEmpty)
    assert(native === composed)
  }

  test("partition-count independent") {
    val (p, v) = mkFrames(
      (1L to 40L).flatMap { u =>
        Seq((u, u * 10L, u * 100L, "view"), (u, u * 10L + 5L, u * 100L + 1L, "purchase"))
      })
    def run(parts: Int) = AsOfJoin.backward(
        p.repartition(parts), v.repartition(parts + 1),
        "user_id", "v_user", "ts", "v_ts", rightTie = Some("v_event"))
      .select("event_id", "v_event").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) === run(7))
  }

  test("null right times never match; null left times drop the row") {
    import spark.implicits._
    val p = Seq((1L, Some(100L), 5L), (1L, None, 6L))
      .toDF("user_id", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val v = Seq((1L, None: Option[Long], 7L), (1L, Some(90L), 8L))
      .toDF("v_user", "us", "v_event")
      .withColumn("v_ts", timestamp_micros(col("us"))).drop("us")
    val got = AsOfJoin.backward(p, v, "user_id", "v_user", "ts", "v_ts")
      .select("event_id", "v_event").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((5L, 8L)))
  }
}
