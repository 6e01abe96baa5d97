package graft.domain

import org.apache.spark.sql.DataFrame

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
}
