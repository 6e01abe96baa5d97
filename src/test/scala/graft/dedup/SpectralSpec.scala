package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The property the Fiedler sign-cut exists for: on a graph with two
  * planted communities joined by a single bridge, the partition must
  * recover the communities exactly.
  */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("fiedler sign-cut separates two planted cliques") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(0L to 4L) ++ clique(10L to 14L) ++ Seq((4L, 10L)))
      .toDF("src", "dst")
    val rows = Spectral.fiedler(edges).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(rows.size == 10)
    val left = (0L to 4L).map(rows)
    val right = (10L to 14L).map(rows)
    assert(left.distinct.size == 1, "community A on one side")
    assert(right.distinct.size == 1, "community B on one side")
    assert(left.head != right.head, "the cut separates the communities")
  }

  test("registered query is deterministic and covers all edge nodes") {
    val q = graft.Registry.byName("d18_spectral_bipartition")
    val a = q.run(spark, sf("sf0.001")).collect().map(_.toString).sorted
    val b = q.run(spark, sf("sf0.001")).collect().map(_.toString).sorted
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }
}
