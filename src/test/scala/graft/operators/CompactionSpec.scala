package graft.operators

import graft.SparkSpec

/** Invariants of the sort-preserving greedy bin-pack: bins partition
  * the inventory into contiguous key ranges and the bin id is exactly
  * the running-sum formula — the properties that keep min-max pruning
  * alive after a rewrite.
  */
class CompactionSpec extends SparkSpec {

  test("compaction bins are contiguous in key order and formula-exact") {
    val rows = graft.Registry.byName("s23_compaction_plan")
      .run(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // bin = floor(rows_before / target), monotone over day order
    rows.foreach { case (_, _, before, bin, _, _) =>
      assert(bin == before / 5000L)
    }
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq,
      "bins monotone in key order → contiguous key ranges per bin")
    // per-bin totals consistent with the membership
    rows.groupBy(_._4).foreach { case (_, fs) =>
      assert(fs.map(_._2).sum == fs.head._6, "bin_rows is the bin total")
      assert(fs.length == fs.head._5, "n_files_in_bin matches")
    }
    // running sum really is the prefix sum of file sizes
    val byDay = rows.sortBy(_._1)
    var acc = 0L
    byDay.foreach { case (_, n, before, _, _, _) =>
      assert(before == acc); acc += n
    }
  }
}
