package graft.operators

import graft.SparkSpec

/** Drift classes, and the non-drift cases (reorder, identical). */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "a", 2.0)).toDF("id", "name", "score")

  test("added / removed / type_changed classify correctly") {
    val next = Seq((1, "a", true)).toDF("id", "name", "flag")
    val got = SchemaDrift.diff(base, next).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("flag" -> "added", "score" -> "removed",
      "id" -> "type_changed"))
  }

  test("field reordering is not drift") {
    val reordered = base.select("score", "id", "name")
    assert(SchemaDrift.diff(base, reordered).isEmpty)
  }

  test("identical schemas produce an empty audit") {
    assert(SchemaDrift.diff(base, base).isEmpty)
  }
}
