package graft.operators

import graft.{Registry, SparkSpec}

/** ABC classification invariants. */
class ParetoSpec extends SparkSpec {

  test("classes are contiguous by rank and the cut points are exact") {
    val rows = Registry.byName("a43_abc_pareto").run(spark, sf("sf0.001"))
      .collect().sortBy(_.getInt(1))
    assert(rows.nonEmpty)
    // cumulative is non-decreasing and ends at the total
    val cums = rows.map(_.getDouble(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    val total = cums.last
    // classes appear in A..B..C order with no interleaving
    val classes = rows.map(_.getString(4)).distinct
    assert(classes.sameElements(classes.sorted))
    // every A row's cum share ≤ 80%, first B row crosses it
    rows.foreach { r =>
      val share = r.getDouble(3) / total
      r.getString(4) match {
        case "A" => assert(share <= 0.8 + 1e-9)
        case "B" => assert(share <= 0.95 + 1e-9)
        case _ => ()
      }
    }
    // ranks are a permutation 1..n
    assert(rows.map(_.getInt(1)).toSeq == (1 to rows.length))
  }
}
