package graft.tpch

import graft.{Registry, SparkSpec}

/** Star-shape guards for the SSB block: every flight must plan as the
  * canonical star — pushed fact filters, broadcast dims, and AT MOST the
  * single final aggregate exchange. A second hash exchange means a dim
  * stopped broadcasting and the star degenerated into a shuffle join.
  */
class SsbPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString()

  private def shuffles(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).length

  test("flight 1 probes: pushed filters, zero hash shuffles") {
    Seq("ssb_q1_1", "ssb_q1_2", "ssb_q1_3").foreach { n =>
      val p = plan(n)
      assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
        s"$n pushdown")
      assert(shuffles(p) == 0, s"$n shuffles=${shuffles(p)}")
    }
  }

  test("flights 2-4: one aggregate exchange, dims broadcast, no cartesian") {
    Seq("ssb_q2_1", "ssb_q2_2", "ssb_q2_3", "ssb_q3_1", "ssb_q3_2",
      "ssb_q3_3", "ssb_q3_4", "ssb_q4_1", "ssb_q4_2", "ssb_q4_3")
      .foreach { n =>
        val p = plan(n)
        assert(shuffles(p) <= 1, s"$n shuffles=${shuffles(p)}")
        assert("BroadcastExchange".r.findAllIn(p).length >= 2, s"$n dims")
        assert(!p.contains("CartesianProduct"), n)
      }
  }
}
