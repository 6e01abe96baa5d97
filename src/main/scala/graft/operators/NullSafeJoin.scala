package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — the
  * semantics row for the classic silent-data-loss trap: a plain
  * equi-join DROPS every row whose key is NULL (NULL = NULL is
  * NULL, not true), so joining on a nullable derived key silently
  * sheds the very rows a data-quality pipeline most needs to see.
  * The null-safe operator matches NULL with NULL exactly once.
  *
  * Fixture: line items keyed by NULLIF(l_returnflag, 'N') joined
  * against the 3-row flag dimension (A, R, NULL) — the NULL
  * dimension row collects the entire 'N' population. The result
  * counts per joined label; the oracle states the same with
  * IS NOT DISTINCT FROM. A null-safe join key cannot be a plain
  * hash-partition key in either engine without this operator —
  * Spark plans it as an equi-join on a null-wrapped struct, keeping
  * the shuffle (no BNL).
  */
object NullSafeJoin {

  private val q = Q(
    "j26_null_safe_join",
    (s, d) => {
      import s.implicits._
      val li = Tables(s, d).lineitem
        .select(nullif(col("l_returnflag"), lit("N")).as("k"))
      val dim = Seq(Some("A") -> "accepted", Some("R") -> "returned",
        (None: Option[String]) -> "neutral")
        .map { case (k, v) => (k.orNull, v) }
        .toDF("k", "label")
      li.join(dim, li("k") <=> dim("k"))
        .groupBy("label").agg(count(lit(1)).as("n"))
    },
    Some(
      """WITH li AS (
        |  SELECT nullif(l_returnflag, 'N') AS k FROM lineitem),
        |dim(k, label) AS (VALUES ('A', 'accepted'), ('R', 'returned'),
        |                         (NULL, 'neutral'))
        |SELECT d.label, count(*) AS n
        |FROM li JOIN dim d ON li.k IS NOT DISTINCT FROM d.k
        |GROUP BY 1""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
