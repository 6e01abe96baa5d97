package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** k-anonymity generalization ladder — p11 AUDITS one quasi-identifier
  * choice; anonymising data means choosing a LEVEL: walk the phone
  * column's generalization hierarchy (full → exchange prefix →
  * country code → suppressed) combined with the market segment, and
  * report for each level the group-size profile and the fraction of
  * rows that would still need suppression at k = 10. The publisher
  * picks the first level whose suppression cost is acceptable — this
  * row IS that decision table.
  *
  * One corpus pass: a 4-row level spine exploded against the scan
  * (×4 rows, all map work), one (level, qi) hash agg, then a
  * |groups|-bounded per-level rollup. Exact integers throughout,
  * suppression as ppm floor division.
  */
object GeneralizationLadder {

  private val K = 10

  private val q = Q(
    "p17_generalization_ladder",
    (s, d) => {
      val lvl = explode(sequence(lit(0), lit(3))).as("level")
      // account balance in exact cents, truncated ever coarser
      // (offset keeps operands non-negative: Spark div truncates toward
      // zero while DuckDB // floors - they only agree above zero)
      val gen = expr(
        """CASE level
          |  WHEN 0 THEN CAST(cents AS STRING)
          |  WHEN 1 THEN CAST((cents + 100000) div 10000 AS STRING)
          |  WHEN 2 THEN CAST((cents + 100000) div 100000 AS STRING)
          |  ELSE '*' END""".stripMargin)
      val grouped = Tables(s, d).customer
        .select(round(col("c_acctbal") * 100).cast("long").as("cents"),
          col("c_mktsegment"), lvl)
        .select(col("level"),
          concat(gen, lit("|"), col("c_mktsegment")).as("qi"))
        .groupBy("level", "qi").agg(count(lit(1)).as("n"))
      grouped.groupBy("level")
        .agg(count(lit(1)).as("n_groups"),
          min(col("n")).as("min_group"),
          sum(col("n")).as("rows"),
          sum(when(col("n") < K, col("n")).otherwise(0L))
            .as("suppressed_rows"))
        // long, not int: DuckDB's range() is BIGINT and the compare is typed
        .select(col("level").cast("long").as("level"), col("n_groups"),
          col("min_group"), col("suppressed_rows"),
          expr("1000000 * suppressed_rows div rows")
            .as("suppressed_ppm"))
    },
    Some(
      s"""WITH lv AS (SELECT unnest(range(0, 4)) AS level),
         |base AS (
         |  SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
         |    c_mktsegment
         |  FROM customer),
         |gen AS (
         |  SELECT lv.level,
         |    (CASE lv.level
         |       WHEN 0 THEN CAST(cents AS VARCHAR)
         |       WHEN 1 THEN CAST((cents + 100000) // 10000 AS VARCHAR)
         |       WHEN 2 THEN CAST((cents + 100000) // 100000 AS VARCHAR)
         |       ELSE '*' END) || '|' || c_mktsegment AS qi
         |  FROM base CROSS JOIN lv),
         |grouped AS (
         |  SELECT level, qi, count(*) AS n FROM gen GROUP BY 1, 2)
         |SELECT level, count(*) AS n_groups,
         |  CAST(min(n) AS BIGINT) AS min_group,
         |  CAST(sum(CASE WHEN n < $K THEN n ELSE 0 END) AS BIGINT)
         |    AS suppressed_rows,
         |  1000000 * CAST(sum(CASE WHEN n < $K THEN n ELSE 0 END) AS BIGINT)
         |    // CAST(sum(n) AS BIGINT) AS suppressed_ppm
         |FROM grouped GROUP BY 1""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
