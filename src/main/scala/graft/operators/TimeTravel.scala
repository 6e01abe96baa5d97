package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Versioned-table time travel: a table is a base snapshot plus
  * numbered delta commits (upserts and deletes); reading AT version v
  * = the newest surviving row per key across commits ≤ v — the
  * lakehouse read `s15_upsert_merge` materialises eagerly and
  * `j22_scd2_temporal_join` indexes by TIME, here indexed by COMMIT.
  * One key-window over the commit-bounded union; at scale the window
  * is per-key (parallel) and commits prune by a version predicate
  * pushed to the commit-partitioned layout.
  *
  * The fixture derives three commits from the orders table
  * arithmetically: v0 = base totals, v1 = re-prices a third of the
  * keys, v2 = deletes every 10th key and re-prices another sixth —
  * the read runs AT v1 (so v2's deletes must NOT apply).
  */
object TimeTravel {

  val ReadAt = 1

  /** @param commits (version, op ["u"|"d"], key, value); read at `v`. */
  def readAt(commits: DataFrame, v: Int): DataFrame = {
    val w = Window.partitionBy("key").orderBy(desc("version"))
    commits.filter(col("version") <= v)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "u")
      .select(col("key"), col("value"), col("version").as("as_of_commit"))
  }

  private def commitsOf(t: Tables): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(12, 2)
    val base = t.orders.select(lit(0).as("version"), lit("u").as("op"),
      col("o_orderkey").as("key"),
      col("o_totalprice").cast(dec).as("value"))
    val v1 = t.orders.filter(col("o_orderkey") % 3 === 0)
      .select(lit(1).as("version"), lit("u").as("op"),
        col("o_orderkey").as("key"),
        (col("o_totalprice").cast(dec) + lit(100)).cast(dec).as("value"))
    val v2del = t.orders.filter(col("o_orderkey") % 10 === 0)
      .select(lit(2).as("version"), lit("d").as("op"),
        col("o_orderkey").as("key"), lit(null).cast(dec).as("value"))
    val v2up = t.orders.filter(col("o_orderkey") % 6 === 1)
      .select(lit(2).as("version"), lit("u").as("op"),
        col("o_orderkey").as("key"),
        (col("o_totalprice").cast(dec) - lit(50)).cast(dec).as("value"))
    base.union(v1).union(v2del).union(v2up)
  }

  private val q = Q(
    "s34_time_travel_read",
    (s, d) => readAt(commitsOf(Tables(s, d)), ReadAt)
      .withColumn("value", col("value").cast("double")),
    Some(
      s"""WITH commits AS (
         |  SELECT 0 AS version, 'u' AS op, o_orderkey AS key,
         |    CAST(o_totalprice AS DECIMAL(12,2)) AS value FROM orders
         |  UNION ALL
         |  SELECT 1, 'u', o_orderkey,
         |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 100
         |      AS DECIMAL(12,2))
         |  FROM orders WHERE o_orderkey % 3 = 0
         |  UNION ALL
         |  SELECT 2, 'd', o_orderkey, NULL
         |  FROM orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT 2, 'u', o_orderkey,
         |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) - 50
         |      AS DECIMAL(12,2))
         |  FROM orders WHERE o_orderkey % 6 = 1),
         |ranked AS (
         |  SELECT key, op, value, version,
         |    row_number() OVER (PARTITION BY key ORDER BY version DESC)
         |      AS rn
         |  FROM commits WHERE version <= $ReadAt)
         |SELECT key, CAST(value AS DOUBLE) AS value,
         |  CAST(version AS INT) AS as_of_commit
         |FROM ranked WHERE rn = 1 AND op = 'u'""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
