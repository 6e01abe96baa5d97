package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-contract auditing — the dbt-test / Great-Expectations
  * layer a production feed runs before publishing (reference anchor: the
  * reference validates enriched ads field-by-field in its flows'
  * `validate_` steps, e.g. salary bounds in
  * `ojd_daps/flows/enrich/salaries.py`; this is that idea as ONE
  * engine-level operator instead of per-field Python).
  *
  * Shape: the four row-local constraint classes (not-null, uniqueness,
  * range, accepted-values) reduce in a SINGLE aggregate pass over the
  * fact table — violations are counters, so the scan is one job with
  * map-side combine regardless of how many constraints ride it; the one
  * cross-table constraint (referential integrity) is a broadcast anti
  * join counted in the same output schema. At 100 TB the audit costs
  * exactly one table scan + one dim broadcast, which is why contracts
  * belong in the engine and not in a driver loop.
  */
object Audits {

  private val expectations = Q(
    "a37_expectation_audit",
    (s, d) => {
      val t = Tables(s, d)
      val o = t.orders
      val base = o.agg(
        count(lit(1)).as("total"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
          .as("v_notnull"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_unique"),
        sum(when(col("o_totalprice") < 0d ||
          col("o_totalprice") >= 300000d, 1L).otherwise(0L)).as("v_range"),
        sum(when(!col("o_orderstatus").isin("O", "F"), 1L).otherwise(0L))
          .as("v_accepted"))
      val rowLocal = base.select(
        expr(
          """stack(4,
            |  'not_null:o_custkey',           v_notnull,
            |  'unique:o_orderkey',            v_unique,
            |  'range:o_totalprice[0,300000)', v_range,
            |  'accepted:o_orderstatus{O,F}',  v_accepted)
            |  AS (constraint, violations)""".stripMargin),
        col("total"))
      val referential = o
        .join(broadcast(t.customer.select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("referential:o_custkey->customer").as("constraint"),
          col("violations"))
        .crossJoin(broadcast(base.select(col("total"))))
      rowLocal.unionByName(referential)
        .withColumn("ok", col("violations") === 0L)
    },
    Some(
      """WITH t AS (SELECT count(*) AS total FROM orders)
        |SELECT c.constraint, c.violations, t.total,
        |  c.violations = 0 AS ok
        |FROM t CROSS JOIN (
        |  SELECT 'not_null:o_custkey' AS constraint,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique:o_orderkey',
        |    count(*) - count(DISTINCT o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'range:o_totalprice[0,300000)',
        |    CAST(sum(CASE WHEN o_totalprice < 0
        |      OR o_totalprice >= 300000 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'accepted:o_orderstatus{O,F}',
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F')
        |      THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'referential:o_custkey->customer',
        |    CAST(count(*) AS BIGINT)
        |  FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                    WHERE c.c_custkey = o.o_custkey)) c""".stripMargin),
  )

  /** Dead-letter split: rows failing the contract route to a quarantine
    * table carrying the FIRST failing rule as the reason (rule order IS
    * the spec), valid rows flow on. The predicate chain is one codegen
    * projection — quarantining costs nothing beyond the write. The
    * registered query returns the quarantine side; the happy path is
    * its anti-complement by construction.
    */
  private val quarantine = Q(
    "s24_quarantine_split",
    (s, d) =>
      Tables(s, d).orders
        .withColumn("reason",
          when(col("o_custkey").isNull, "not_null:o_custkey")
            .when(col("o_totalprice") < 0d ||
              col("o_totalprice") >= 300000d,
              "range:o_totalprice[0,300000)")
            .when(!col("o_orderstatus").isin("O", "F"),
              "accepted:o_orderstatus{O,F}"))
        .filter(col("reason").isNotNull)
        .select(col("o_orderkey"), col("reason")),
    Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_custkey IS NULL THEN 'not_null:o_custkey'
        |       WHEN o_totalprice < 0 OR o_totalprice >= 300000
        |         THEN 'range:o_totalprice[0,300000)'
        |       WHEN o_orderstatus NOT IN ('O','F')
        |         THEN 'accepted:o_orderstatus{O,F}'
        |  END AS reason
        |FROM orders
        |WHERE o_custkey IS NULL
        |   OR o_totalprice < 0 OR o_totalprice >= 300000
        |   OR o_orderstatus NOT IN ('O','F')""".stripMargin),
  )

  /** round(1e6·log10(1 + 1/d)) — Benford's first-digit law in ppm. */
  val benfordPpm: Seq[Long] = Seq(301030L, 176091L, 124939L, 96910L,
    79181L, 66947L, 57992L, 51153L, 45757L)

  /** Benford first-digit audit — the classic scale-invariant anomaly
    * screen for value columns (synthetic or truncated distributions
    * deviate hard; natural multi-decade ones conform). The leading
    * digit comes from the CENTS integer's decimal string (shifting the
    * decimal point preserves the leading significant digit), never from
    * float log10 — identical across engines by construction. One hash
    * aggregate on a 9-value key.
    */
  private val benford = Q(
    "a38_benford_audit",
    (s, d) => {
      val digitPpm = benfordPpm.zipWithIndex.foldLeft(lit(0L)) {
        case (acc, (p, i)) => when(col("digit") === (i + 1).toString, p)
          .otherwise(acc)
      }
      Tables(s, d).orders
        .filter(col("o_totalprice") > 0d)
        .withColumn("digit",
          substring(expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT)" +
            " AS STRING)"), 1, 1))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over())
        .withColumn("obs_ppm", expr("(1000000 * n) div total"))
        .withColumn("benford_ppm", digitPpm)
        .select(col("digit"), col("n"), col("obs_ppm"), col("benford_ppm"),
          abs(col("obs_ppm") - col("benford_ppm")).as("dev_ppm"))
    },
    Some {
      val cases = benfordPpm.zipWithIndex
        .map { case (p, i) => s"WHEN '${i + 1}' THEN $p" }.mkString(" ")
      s"""WITH d AS (
         |  SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
         |    AS VARCHAR), 1, 1) AS digit
         |  FROM orders WHERE o_totalprice > 0),
         |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
         |t AS (SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS total
         |      FROM g)
         |SELECT digit, n, CAST((1000000 * n) // total AS BIGINT)
         |    AS obs_ppm,
         |  CAST(CASE digit $cases ELSE 0 END AS BIGINT) AS benford_ppm,
         |  abs(CAST((1000000 * n) // total AS BIGINT)
         |    - (CASE digit $cases ELSE 0 END)) AS dev_ppm
         |FROM t""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(expectations, quarantine, benford)
}
