package graft.tpch

import graft.{Registry, SparkSpec}

/** Plan-shape guards for the TPC-H conformance block: the suite is only
  * worth having if the compositions keep their scale discipline — the
  * disjunctive Q19 must stay an equi hash join, the semi/anti chains must
  * compile to (anti-)semi joins rather than aggregated self-joins, dims
  * must broadcast, and the LIMIT queries must TakeOrderedAndProject.
  */
class TpchPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString()

  private def shuffles(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).length

  test("q01: pushed shipdate filter, one aggregate shuffle") {
    val p = plan("tpch_q01")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), "pushdown")
    assert(shuffles(p) == 1, s"shuffles=${shuffles(p)}")
  }

  test("q06: pure scan + global agg, zero hash shuffles") {
    val p = plan("tpch_q06")
    assert(p.contains("PushedFilters: ["), "scan has pushed filters")
    assert(!p.contains("PushedFilters: []"), "pushed filter list non-empty")
    assert(shuffles(p) == 0)
  }

  test("q05: nation and region broadcast into the 6-way join") {
    val p = plan("tpch_q05")
    assert("BroadcastExchange".r.findAllIn(p).length >= 2)
    assert(!p.contains("CartesianProduct"))
  }

  test("q19: disjunctive predicate keeps the equi hash join") {
    val p = plan("tpch_q19")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "the shared p_partkey = l_partkey key must drive a hash join")
  }

  test("q04/q21: EXISTS chains compile to semi/anti joins") {
    assert(plan("tpch_q04").contains("LeftSemi"))
    val p21 = plan("tpch_q21")
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"))
  }

  test("q03/q10/q18: top-N is TakeOrderedAndProject, no global sort") {
    Seq("tpch_q03", "tpch_q10", "tpch_q18").foreach { n =>
      assert(plan(n).contains("TakeOrderedAndProject"), n)
    }
  }
}
