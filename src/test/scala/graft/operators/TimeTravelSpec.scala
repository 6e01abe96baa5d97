package graft.operators

import graft.SparkSpec

class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private val commits = Seq(
    (0, "u", 1L, 10.0), (0, "u", 2L, 20.0), (0, "u", 3L, 30.0),
    (1, "u", 1L, 11.0),            // re-price key 1
    (1, "d", 2L, 0.0),             // delete key 2 at v1
    (2, "u", 2L, 22.0),            // resurrect key 2 at v2
    (2, "d", 3L, 0.0))             // delete key 3 at v2
    .toDF("version", "op", "key", "value")

  private def at(v: Int): Map[Long, (Double, Int)] =
    TimeTravel.readAt(commits, v).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap

  test("each version sees exactly its committed world") {
    assert(at(0) == Map(1L -> (10.0, 0), 2L -> (20.0, 0), 3L -> (30.0, 0)))
    assert(at(1) == Map(1L -> (11.0, 1), 3L -> (30.0, 0)))  // 2 deleted
    assert(at(2) == Map(1L -> (11.0, 1), 2L -> (22.0, 2)))  // 3 deleted,
                                                            // 2 is back
  }
}
