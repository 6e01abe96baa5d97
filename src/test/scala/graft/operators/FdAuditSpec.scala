package graft.operators

import graft.SparkSpec

/** The FD audit must say yes to a real key dependency and no to a
  * many-to-many one, with violation counts that mean what they claim.
  */
class FdAuditSpec extends SparkSpec {

  test("fd audit separates holding from violated dependencies") {
    val rows = graft.Registry.byName("a33_fd_audit")
      .run(spark, sf("sf0.001")).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    // o_orderkey is the orders primary key → determines o_custkey
    val (g1, v1, m1, h1) = rows(("orders", "o_orderkey", "o_custkey"))
    assert(h1 && v1 == 0 && m1 == 1 && g1 > 0)
    // an order spans many parts → FD violated with real counts
    val (g2, v2, m2, h2) = rows(("lineitem", "l_orderkey", "l_partkey"))
    assert(!h2 && v2 > 0 && m2 > 1 && g2 > 0)
    // violating groups can never exceed group count
    rows.values.foreach { case (g, v, _, _) => assert(v <= g) }
  }
}
