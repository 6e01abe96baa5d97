package graft.operators

import graft.SparkSpec

/** Sorted-neighborhood blocking: adjacency in the sorted order finds
  * the boundary-straddling pair fixed banding misses.
  */
class SnmSpec extends SparkSpec {
  import spark.implicits._

  test("band-straddling near pair is a candidate; far pairs are not") {
    val dir = java.nio.file.Files.createTempDirectory("snm").toString
    // 999.99 and 1000.01 straddle the 1000-band boundary (j15's band
    // field separates them) but are adjacent in sort order, 2 cents
    // apart → SNM catches the pair
    Seq(
      (1L, "SEG", 10.0), (2L, "SEG", 999.99), (3L, "SEG", 1000.01),
      (4L, "SEG", 5000.0), (5L, "OTHER", 999.98),
    ).toDF("c_custkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = graft.Registry.byName("j19_sorted_neighborhood")
      .run(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getLong(4), r.getBoolean(5))).toMap
    // the straddling pair: gap = 2 cents, candidate
    assert(got((2L, 3L)) == ((2L, true)), s"got ${got.get((2L, 3L))}")
    // distant neighbors are emitted but not candidates
    assert(got((1L, 2L)) == ((98999L, false)))
    assert(got((3L, 4L)) == ((399999L, false)))
    // windows never cross the segment partition
    assert(!got.contains((5L, 1L)) && !got.contains((4L, 5L)))
    // w=2 pairs exist too (1,3), (2,4)
    assert(got.contains((1L, 3L)) && got.contains((2L, 4L)))
  }
}
