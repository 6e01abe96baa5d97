package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Volume-floor sanity gates — the reference's production pipeline
  * asserts minimum row counts between stages (flows/aggregate/
  * update_cache.py:36-102: >100k duplicate subgraphs, >1M features,
  * >=10k ads per window, etc.) and aborts the run rather than publish
  * indicators computed from a silently-truncated upstream.
  *
  * Each check is one `count()` action — deliberate: a guardrail that
  * doesn't force evaluation guards nothing.
  */
object Guardrails {

  final class FloorViolation(val stage: String, val floor: Long,
      val actual: Long)
      extends IllegalStateException(
        s"guardrail: $stage produced $actual rows, floor is $floor")

  /** Assert `df` has at least `floor` rows; returns `df` for chaining. */
  def assertFloor(df: DataFrame, stage: String, floor: Long): DataFrame = {
    val n = df.count()
    if (n < floor) throw new FloorViolation(stage, floor, n)
    df
  }

  /** Assert several floors; violations are collected so the failure
    * message names every broken stage (one pass per frame, like the
    * reference's per-step asserts).
    */
  def assertFloors(floors: Seq[(String, DataFrame, Long)]): Unit = {
    val broken = floors.flatMap { case (stage, df, floor) =>
      val n = df.count()
      if (n < floor) Some(s"$stage=$n<$floor") else None
    }
    if (broken.nonEmpty)
      throw new IllegalStateException(
        s"guardrails violated: ${broken.mkString(", ")}")
  }

  /** FREE floor check for a frame that an enclosing pipeline is about to
    * execute anyway: piggybacks on `Dataset.observe`, so the row count is
    * collected by the action the caller already runs — no extra job, no
    * extra scan (the 100 TB posture; `assertFloor`'s dedicated `count()`
    * stays for gate points with no downstream action). Call the returned
    * check AFTER an action has run on the returned frame; a check called
    * before any action sees the metric's zero state and fails the floor
    * conservatively — a guardrail that never observed its stage refuses
    * to vouch for it.
    */
  def observedFloor(df: DataFrame, stage: String,
      floor: Long): (DataFrame, () => Unit) = {
    // Observation (not a named observe + queryExecution.observedMetrics):
    // every action builds a NEW QueryExecution, so the original plan's
    // metrics never populate — Observation registers a listener and is
    // fed by whichever execution carries the named CollectMetrics node.
    val obs = new org.apache.spark.sql.Observation(s"graft_floor_$stage")
    val observed = df.observe(obs, count(lit(1)).as("n"))
    val check = () => {
      // the future is fulfilled ASYNC by the listener bus after the
      // caller's action completes — wait briefly; a still-unfulfilled
      // future after the grace period = no action observed → 0
      val n = try {
        scala.concurrent.Await
          .result(obs.future, scala.concurrent.duration.Duration("5s"))
          .getLong(0)
      } catch { case _: java.util.concurrent.TimeoutException => 0L }
      if (n < floor) throw new FloorViolation(stage, floor, n)
    }
    (observed, check)
  }
}
