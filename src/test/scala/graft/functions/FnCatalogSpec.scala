package graft.functions

import graft.{Registry, SparkSpec}

/** Plan-pins the V2 FunctionCatalog binding of `f21_fncatalog_hamming`
  * (`GraftFunctionCatalog.Hamming64`): the magic-method contract must
  * resolve to a codegen `Invoke` of `Bound.invoke(Long, Long)`. A silent
  * regression to the interpreted `produceResult` fallback (which plans
  * as an `ApplyFunctionExpression`, printed `hamming64(...)`, boxing
  * every row) would pass every value-level gate — only the plan shows
  * the difference, so the plan is what this spec asserts.
  */
class FnCatalogSpec extends SparkSpec {

  test("hamming64 resolves through the catalog to a magic-method Invoke") {
    val df = Registry.byName("f21_fncatalog_hamming")
      .run(spark, sf("sf0.001"))
    val opt = df.queryExecution.optimizedPlan.toString
    // the codegen binding: a static Invoke on the Java bound function
    // (r08: the former Scala object's instance `invoke` planned fine
    // but Janino rejected the generated static call at RUNTIME and the
    // stage silently ran interpreted — so this spec now also executes
    // with codegen fallback DISABLED below)
    assert(opt.contains("invoke(") && opt.contains("HammingBound"),
      s"magic-method Invoke binding regressed; plan:\n$opt")
    // the interpreted fallback prints as the function's pretty name —
    // its presence means produceResult boxing snuck back in
    assert(!opt.contains("hamming64("),
      s"plan fell back to interpreted ApplyFunctionExpression:\n$opt")
    // and the distances are actually right (popcount-of-xor spot check),
    // computed with whole-stage-codegen fallback OFF: a Janino compile
    // error now fails the test instead of silently interpreting
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = df.collect()
      assert(rows.nonEmpty)
      assert(rows.map(_.getLong(1)).sum ==
        spark.read.parquet(sf("sf0.001") + "/lineitem.parquet").count())
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
