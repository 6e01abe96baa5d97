package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision-stump split evaluation — the inner loop of distributed
  * tree training (XGBoost/LightGBM histogram method): bin the feature,
  * accumulate per-bin (count, positives), then score every bin
  * boundary as a split by weighted Gini impurity. The histogram trick
  * IS the scale story: the corpus is scanned once into ≤ |bins|
  * sufficient statistics and every candidate split is scored from the
  * 10-row table — no per-split passes, no sort. Bins come from the
  * a47 percentile-cut assignment (a map against 9 broadcast cuts).
  *
  * Gini of a side = 1 − p² − (1−p)²; the weighted score
  * (nL·gL + nR·gR)/n is computed as one fixed IEEE chain over exact
  * BIGINT counts, so both engines agree bit-for-bit after the round.
  */
object StumpSplit {

  private val q = Q(
    "a48_stump_split",
    (s, d) => {
      val o = Tables(s, d).orders
        .select(col("o_totalprice").as("score"),
          (col("o_orderpriority") === "1-URGENT").cast("long").as("y"))
      // same count-table cuts as a47 (see that comment): identical
      // interpolation, no single-task value buffer
      val cuts = graft.util.OrderStats.percentilesByGroup(
        o.select(lit(1).as("__g"), col("score")), "__g", "score",
        (1 to 9).map(i => s"c$i" -> i / 10.0)).drop("__g")
      val bin = (1 to 9).foldLeft(lit(1L)) { (acc, i) =>
        acc + when(col("score") > col(s"c$i"), 1L).otherwise(0L)
      }
      val hist = o.crossJoin(broadcast(cuts))
        .select(bin.as("bin"), col("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
      val tot = hist.agg(sum(col("n")).as("tn"), sum(col("pos")).as("tp"))
      def gini(n: org.apache.spark.sql.Column,
          p: org.apache.spark.sql.Column) = {
        val pd = p.cast("double") / n.cast("double")
        lit(1.0) - pd * pd - (lit(1.0) - pd) * (lit(1.0) - pd)
      }
      hist
        .withColumn("nl", sum(col("n")).over(w))
        .withColumn("pl", sum(col("pos")).over(w))
        .crossJoin(broadcast(tot))
        .filter(col("bin") < 10)  // boundary AFTER bin b; bin 10 is no split
        .select(col("bin").as("split_after_bin"), col("nl"), col("pl"),
          (col("tn") - col("nl")).as("nr"), (col("tp") - col("pl")).as("pr"))
        .withColumn("gini_split",
          round((col("nl").cast("double") * gini(col("nl"), col("pl")) +
            col("nr").cast("double") * gini(col("nr"), col("pr"))) /
            (col("nl") + col("nr")).cast("double"), 6))
    },
    Some {
      val cutSelect = (1 to 9)
        .map(i => s"quantile_cont(score, ${i / 10.0}) AS c$i")
        .mkString(", ")
      val binExpr = "1 " + (1 to 9)
        .map(i => s"+ CASE WHEN score > c$i THEN 1 ELSE 0 END")
        .mkString(" ")
      s"""WITH o AS (
         |  SELECT o_totalprice AS score,
         |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
         |  FROM orders),
         |cuts AS (SELECT $cutSelect FROM o),
         |hist AS (
         |  SELECT CAST($binExpr AS BIGINT) AS bin, count(*) AS n,
         |    CAST(sum(y) AS BIGINT) AS pos
         |  FROM o CROSS JOIN cuts GROUP BY 1),
         |cum AS (
         |  SELECT bin,
         |    CAST(sum(n) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS nl,
         |    CAST(sum(pos) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS pl
         |  FROM hist),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
         |  CAST(sum(pos) AS BIGINT) AS tp FROM hist)
         |SELECT bin AS split_after_bin, nl, pl,
         |  tn - nl AS nr, tp - pl AS pr,
         |  round((CAST(nl AS DOUBLE) * (1.0
         |      - (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
         |        * (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
         |      - (1.0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
         |        * (1.0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)))
         |    + CAST(tn - nl AS DOUBLE) * (1.0
         |      - (CAST(tp - pl AS DOUBLE) / CAST(tn - nl AS DOUBLE))
         |        * (CAST(tp - pl AS DOUBLE) / CAST(tn - nl AS DOUBLE))
         |      - (1.0 - CAST(tp - pl AS DOUBLE) / CAST(tn - nl AS DOUBLE))
         |        * (1.0 - CAST(tp - pl AS DOUBLE) / CAST(tn - nl AS DOUBLE))))
         |    / CAST(nl + (tn - nl) AS DOUBLE), 6) AS gini_split
         |FROM cum CROSS JOIN tot
         |WHERE bin < 10""".stripMargin
    },
  )

  def all: Seq[Q] = Seq(q)
}
