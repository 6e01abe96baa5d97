package graft.dedup

import graft.{Registry, SparkSpec}

class KTrussSpec extends SparkSpec {
  import spark.implicits._

  test("K4 survives the 4-truss; a hanging triangle peels in cascade") {
    // K4 on 1..4 (each edge in 2 triangles) + triangle {4,5,6} glued
    // at node 4 + pendant 6-7
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L))
    val got = KTruss.run(edges.toDF("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    // K4 edges never leave
    Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)).foreach(e =>
      assert(got(e).isEmpty))
    // pendant and the glued triangle's edges (support 1 < 2) go round 1
    assert(got((6L, 7L)).contains(1))
    assert(got((4L, 5L)).contains(1))
    assert(got((5L, 6L)).contains(1))
    assert(got((4L, 6L)).contains(1))
  }

  test("positional search finds the corpus' top adjacent pair") {
    val dir = java.nio.file.Files.createTempDirectory("ps").toString
    Seq((1L, "big data big data big data"), (2L, "big data works"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Registry.byName("t_positional_search").run(spark, dir).head()
    assert((r.getString(0), r.getString(1)) == (("big", "data")))
    assert(r.getLong(2) == 4L)  // 3 in doc 1 + 1 in doc 2
    assert(r.getLong(3) == 2L)
  }
}
