package graft.operators

import graft.{Registry, SparkSpec}

/** Forward as-of via time reflection through the backward native exec. */
class AsOfForwardSpec extends SparkSpec {
  import spark.implicits._

  private def run(events: Seq[(Long, Int, Long, String)])
      : Map[Long, Long] = {
    import java.sql.Timestamp
    val df = events.map { case (id, minute, user, typ) =>
      (id, Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), user, typ,
        0d, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("fwd").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Registry.byName("j12d_asof_forward").run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("next purchase at-or-after the view, per user") {
    val got = run(Seq(
      (1L, 5, 1L, "view"),
      (2L, 3, 1L, "purchase"),  // before the view: not eligible
      (3L, 7, 1L, "purchase"),  // next after: picked
      (4L, 9, 1L, "purchase"),
      (5L, 2, 2L, "view"),      // user 2 never purchases: dropped
    ))
    assert(got == Map(1L -> 3L))
  }

  test("purchase at the exact view instant is eligible (<=)") {
    val got = run(Seq((1L, 5, 1L, "view"), (2L, 5, 1L, "purchase")))
    assert(got == Map(1L -> 2L))
  }

  test("equal-time purchases tie to the smallest event id") {
    val got = run(Seq((1L, 4, 1L, "view"),
      (9L, 6, 1L, "purchase"), (7L, 6, 1L, "purchase")))
    assert(got == Map(1L -> 7L))
  }
}

/** Rich-club coefficients on hand graphs. */
class RichClubSpec extends SparkSpec {
  import spark.implicits._

  private def phi(edges: Seq[(Long, Long)]): Map[Long, Option[Double]] =
    graft.dedup.RichClub.coefficients(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

  test("complete K5: the whole graph is one perfect club at k=2") {
    val k5 = for { a <- 0L to 4L; b <- 0L to 4L if a < b } yield (a, b)
    val got = phi(k5)
    assert(got(2L).contains(1.0)) // degs all 4 > 2, all edges survive
    assert(got(4L).isEmpty)       // nobody exceeds degree 4
  }

  test("star: no club — fewer than two nodes clear any bar above 1") {
    val star = (1L to 6L).map(l => (0L, l))
    val got = phi(star)
    assert(got(2L).isEmpty) // only the hub has degree > 2
  }
}
