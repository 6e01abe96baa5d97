package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Brown–Forsythe (median-based Levene) — the equal-spread gate the
  * ANOVA family rests on: a83 asks "do the groups' MEANS differ
  * under unequal variance", this asks "do the VARIANCES differ",
  * robustly, via a one-way F on absolute deviations from the group
  * MEDIAN.
  *
  * Fully integer until the final ratio: prices become exact cents,
  * each group's median comes from the a54 count-table cumulative
  * window as the DOUBLED integer lo+up (so even-n halves stay
  * integral), deviations z = |2x − (lo+up)| are exact BIGINT cents,
  * and their sums ride DECIMAL(30,0) (z² over 10⁵ rows overflows
  * BIGINT; at cluster scale this is the overflow-proof form). The
  * ×2 scaling cancels in F. Between/within sums of squares then use
  * Σ Sg²/ng in decimal-stable doubles.
  *
  * Shape: one (group, cents) count-table agg, per-group windows on
  * the value table, a 5-row median frame broadcast back into the
  * fact scan, one moment aggregate — two fact passes, no sort of
  * the fact table (the median sort is over DISTINCT values).
  */
object BrownForsythe {

  private val K = 5

  private val q = Q(
    "a84_brown_forsythe",
    (s, d) => {
      val cents = Tables(s, d).orders.select(
        col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100.0).cast("long").as("w"))
      val ct = cents.groupBy("grp", "w").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy("grp").orderBy("w")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("ng", sum(col("c")).over(Window.partitionBy("grp")))
      val med = ct.groupBy("grp").agg(
        min(when(col("cum") >= expr("(ng + 1) div 2"), col("w")))
          .as("lo"),
        min(when(col("cum") >= expr("(ng div 2) + 1"), col("w")))
          .as("up"))
      val z = cents.join(broadcast(med), "grp")
        .select(col("grp"),
          abs(lit(2L) * col("w") - col("lo") - col("up")).as("z"))
      val g = z.groupBy("grp").agg(count(lit(1)).as("ng"),
        sum(col("z").cast("decimal(30,0)")).as("sg"),
        sum((col("z") * col("z")).cast("decimal(30,0)")).as("sq"))
      val fin = g.agg(sum(col("ng")).as("n"),
        sum(col("sg")).cast("double").as("stot"),
        sum(col("sq")).cast("double").as("qtot"),
        Stable.dsum(col("sg").cast("double") *
          col("sg").cast("double") / col("ng").cast("double"), 4)
          .as("bsum"))
      fin.select(lit(K.toLong).as("k"), col("n"),
        (col("n") - K).as("df2"),
        round(((col("bsum") - col("stot") * col("stot") /
          col("n").cast("double")) / lit((K - 1).toDouble)) /
          ((col("qtot") - col("bsum")) /
            (col("n") - K).cast("double")), 6).as("f_stat"))
    },
    Some(
      s"""WITH cents AS (
         |  SELECT o_orderpriority AS grp,
         |    CAST(o_totalprice * 100.0 AS BIGINT) AS w
         |  FROM orders),
         |ct AS (
         |  SELECT grp, w, count(*) AS c FROM cents GROUP BY 1, 2),
         |cum AS (
         |  SELECT grp, w, c,
         |    CAST(sum(c) OVER (PARTITION BY grp ORDER BY w
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum,
         |    CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS ng
         |  FROM ct),
         |med AS (
         |  SELECT grp,
         |    min(CASE WHEN cum >= (ng + 1) // 2 THEN w END) AS lo,
         |    min(CASE WHEN cum >= (ng // 2) + 1 THEN w END) AS up
         |  FROM cum GROUP BY 1),
         |z AS (
         |  SELECT cents.grp, abs(2 * cents.w - lo - up) AS z
         |  FROM cents JOIN med ON cents.grp = med.grp),
         |g AS (
         |  SELECT grp, count(*) AS ng,
         |    sum(CAST(z AS DECIMAL(30,0))) AS sg,
         |    sum(CAST(z * z AS DECIMAL(30,0))) AS sq
         |  FROM z GROUP BY 1),
         |fin AS (
         |  SELECT CAST(sum(ng) AS BIGINT) AS n,
         |    CAST(sum(sg) AS DOUBLE) AS stot,
         |    CAST(sum(sq) AS DOUBLE) AS qtot,
         |    ${Stable.dsumSql(
               "CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)" +
                 " / CAST(ng AS DOUBLE)", 4)} AS bsum
         |  FROM g)
         |SELECT CAST($K AS BIGINT) AS k, n,
         |  CAST(n - $K AS BIGINT) AS df2,
         |  round(((bsum - stot * stot / CAST(n AS DOUBLE))
         |      / CAST(${K - 1} AS DOUBLE))
         |    / ((qtot - bsum) / CAST(n - $K AS DOUBLE)), 6) AS f_stat
         |FROM fin""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
