package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in Catalyst optimizer rule: rewrite exact `COUNT(DISTINCT x)` to
  * the HyperLogLog++ sketch when the session sets
  * `spark.graft.approxDistinct=true`.
  *
  * Why a RULE and not a code change: exact distinct aggregation is the
  * one counter-style aggregate that cannot map-side combine — Spark
  * plans it as a keyed partial aggregate whose exchange carries every
  * distinct key (see `a37_expectation_audit`'s plan audit: the
  * uniqueness constraint is the audit's only hash exchange). At
  * dashboard/monitoring call sites a ±2% estimate is usually fine, and
  * the sketch turns that key shuffle into a few-KB mergeable register
  * buffer per group — but the call sites are spread across query code
  * that should not fork into exact/approx variants. A session-scoped
  * rewrite puts the policy where Catalyst puts every other physical
  * decision: in the plan, governed by configuration.
  *
  * Scope guards: only plain single-argument COUNT(DISTINCT x) rewrites
  * (multi-arg distinct counts and FILTER clauses pass through
  * untouched), and the output type is unchanged (both aggregates yield
  * BIGINT), so downstream expressions and resultIds are preserved via
  * `copy` — the rule is shape-stable under re-optimization (idempotent:
  * the rewritten node no longer matches).
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule` —
  * the third extension surface beside the function registry (§2.8) and
  * the engine's custom expressions.
  */
case class ApproxDistinctRewrite(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    session.conf.getOption("spark.graft.approxDistinct")
      .exists(_.equalsIgnoreCase("true"))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(c: Count, _, true, None, _)
              if c.children.length == 1 =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(c.children.head),
              isDistinct = false)
        }
    }
}
