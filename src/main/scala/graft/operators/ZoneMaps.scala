package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Zone maps — the file-footer min/max statistics layer made queryable.
  *
  * At 100 TB a predicate like `o_totalprice BETWEEN lo AND hi` should
  * never touch most files: each parquet file (or row-group) carries
  * min/max per column, and the scan skips any file whose range cannot
  * intersect the predicate. Spark consults those footers implicitly; a
  * *zone-map table* makes the same statistics a first-class, queryable
  * artifact, which is what a table-format metadata layer (Iceberg/Delta
  * manifests) is: plan file skipping BEFORE listing, audit layout
  * quality, and decide when to re-cluster (see `s23_compaction_plan`,
  * `f16_zorder_key`, `f17_hilbert_key` — tighter zones are exactly what
  * those layouts buy).
  *
  * Zones here are the table's natural layout key (orderdate month — the
  * unit a time-partitioned 100 TB fact table writes one file-set per).
  * The operator emits, per zone: row count, the min/max zone map for the
  * probe column, the pruning decision for a concrete predicate, and the
  * true matching rows — so `pruned=true ∧ n_matching>0` is impossible
  * (safety) and `pruned=false ∧ n_matching=0` measures the layout's
  * false-positive scan cost (precision). One scan, one groupBy — the
  * stats build is map-side combined and costs a single pass, after
  * which planning is O(zones), not O(data).
  *
  * Reference anchor: the reference reads S3 object listings and filters
  * by key prefix before fetching bodies (ojd_daps/flows/extract) — the
  * same skip-before-read idea, done there by naming convention, done
  * here by statistics.
  */
object ZoneMaps {

  private val lo = 50000d
  private val hi = 60000d

  private val zonemap = Q(
    "s27_zonemap_prune",
    (s, d) => {
      val o = Tables(s, d).orders
      o.groupBy((year(col("o_orderdate")) * 100 +
          month(col("o_orderdate"))).cast("long").as("zone"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("o_totalprice")).as("zmin"),
          max(col("o_totalprice")).as("zmax"),
          sum(when(col("o_totalprice") >= lo && col("o_totalprice") < hi, 1L)
            .otherwise(0L)).as("n_matching"))
        .withColumn("pruned", col("zmax") < lo || col("zmin") >= hi)
    },
    Some(
      s"""SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
         |    AS zone,
         |  count(*) AS n_rows,
         |  min(o_totalprice) AS zmin,
         |  max(o_totalprice) AS zmax,
         |  CAST(sum(CASE WHEN o_totalprice >= $lo AND o_totalprice < $hi
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_matching,
         |  max(o_totalprice) < $lo OR min(o_totalprice) >= $hi AS pruned
         |FROM orders GROUP BY 1""".stripMargin),
  )

  def queries: Seq[Q] = Seq(zonemap)
}
