package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** Supervised feature-prep operators: leakage-safe target encoding and
  * the decile lift/gains table — the two tabular-ML staples between
  * the corpus curation family (train/test split, stratified sample)
  * and the evaluation family (NDCG, calibration-adjacent audits).
  */
object FeaturePrep {

  val Folds = 5

  /** Leave-one-fold-out target encoding (the leakage-controlled mean
    * encoder every gradient-boosting pipeline ships): category c, fold
    * f gets mean(target | c, all folds ≠ f) — a row never sees its own
    * fold's targets, so the encoding can't memorise it. Emitted per
    * (category, fold) cell as the exact decimal rational
    * (enc_num, enc_den) plus one rounded display divide; a category
    * confined to a single fold has no out-of-fold evidence → NULL.
    *
    * Scale: one (category, fold) hash agg over the corpus (map-side
    * combined), category totals from a second |cells|-sized agg, one
    * broadcast join — the corpus is scanned once, nothing per-row
    * shuffles twice.
    */
  private val target = Q(
    "a46_target_encoding",
    (s, d) => {
      val dec = DataTypes.createDecimalType(12, 2)
      val cells = Tables(s, d).orders
        .select(col("o_orderpriority").as("cat"),
          (col("o_orderkey") % Folds).as("fold"),
          col("o_totalprice").cast(dec).as("t"))
        .groupBy("cat", "fold")
        .agg(count(lit(1)).as("n_kf"), sum(col("t")).as("s_kf"))
      val totals = cells.groupBy("cat")
        .agg(sum(col("n_kf")).as("n_k"), sum(col("s_kf")).as("s_k"))
      cells.join(broadcast(totals), "cat")
        .select(col("cat"), col("fold"),
          (col("n_k") - col("n_kf")).as("enc_den"),
          (col("s_k") - col("s_kf")).cast("double").as("enc_num"))
        .withColumn("enc",
          when(col("enc_den") > 0,
            round(col("enc_num") / col("enc_den").cast("double"), 6)))
    },
    Some(
      s"""WITH cells AS (
         |  SELECT o_orderpriority AS cat, o_orderkey % $Folds AS fold,
         |    count(*) AS n_kf,
         |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS s_kf
         |  FROM orders GROUP BY 1, 2),
         |totals AS (
         |  SELECT cat, CAST(sum(n_kf) AS BIGINT) AS n_k,
         |    CAST(sum(s_kf) AS DECIMAL(22,2)) AS s_k
         |  FROM cells GROUP BY 1)
         |SELECT cells.cat, cells.fold,
         |  CAST(totals.n_k - cells.n_kf AS BIGINT) AS enc_den,
         |  CAST(totals.s_k - cells.s_kf AS DOUBLE) AS enc_num,
         |  CASE WHEN totals.n_k - cells.n_kf > 0 THEN
         |    round(CAST(totals.s_k - cells.s_kf AS DOUBLE)
         |      / CAST(totals.n_k - cells.n_kf AS DOUBLE), 6) END AS enc
         |FROM cells JOIN totals ON cells.cat = totals.cat""".stripMargin),
  )

  /** Decile lift/gains table — "how much better than random is the
    * model in its top k⁄10" — over a score column (order value as the
    * stand-in model output) against a binary response (urgent
    * priority). Deciles come from NINE exact percentile cuts computed
    * in one aggregate and broadcast back (the a4/a40 percentile
    * parity), NOT from a global ntile sort — at 100 TB a global sort
    * for ranking is the anti-pattern, a quantile-cut assignment is a
    * map. Lift is the exact rational (cum_pos·n)/(cum_n·pos) emitted
    * beside the rounded display value; cumulation is a 10-row window.
    */
  private val lift = Q(
    "a47_lift_table",
    (s, d) => {
      val o = Tables(s, d).orders
        .select(col("o_totalprice").as("score"),
          (col("o_orderpriority") === "1-URGENT").cast("long").as("y"))
      // cuts via the count-table order statistic, not the buffering
      // percentile UDAF: a GLOBAL percentile is one group — the
      // worst case for a value-buffering aggregate (measured 2.9 s of
      // this query's 2.9 s at sf0.1; 0.4 s after the swap)
      val cuts = graft.util.OrderStats.percentilesByGroup(
        o.select(lit(1).as("__g"), col("score")), "__g", "score",
        (1 to 9).map(i => s"c$i" -> i / 10.0)).drop("__g")
      val decile = (1 to 9).foldLeft(lit(1L)) { (acc, i) =>
        acc + when(col("score") > col(s"c$i"), 1L).otherwise(0L)
      }
      val byDecile = o.crossJoin(broadcast(cuts))
        .select(decile.as("decile"), col("y"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val w = Window.orderBy(desc("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
      byDecile
        .withColumn("cum_n", sum(col("n")).over(w))
        .withColumn("cum_pos", sum(col("pos")).over(w))
        .crossJoin(broadcast(byDecile.agg(sum(col("n")).as("tot_n"),
          sum(col("pos")).as("tot_pos"))))
        .select(col("decile"), col("n"), col("pos"), col("cum_n"),
          col("cum_pos"),
          round((col("cum_pos") * col("tot_n")).cast("double") /
            (col("cum_n") * col("tot_pos")).cast("double"), 6).as("lift"))
    },
    Some {
      val cutSelect = (1 to 9)
        .map(i => s"quantile_cont(score, ${i / 10.0}) AS c$i")
        .mkString(", ")
      val decileExpr = "1 " + (1 to 9)
        .map(i => s"+ CASE WHEN score > c$i THEN 1 ELSE 0 END")
        .mkString(" ")
      s"""WITH o AS (
         |  SELECT o_totalprice AS score,
         |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
         |  FROM orders),
         |cuts AS (SELECT $cutSelect FROM o),
         |dec AS (
         |  SELECT CAST($decileExpr AS BIGINT) AS decile, y
         |  FROM o CROSS JOIN cuts),
         |bydec AS (
         |  SELECT decile, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
         |  FROM dec GROUP BY 1),
         |cum AS (
         |  SELECT decile, n, pos,
         |    CAST(sum(n) OVER (ORDER BY decile DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_n,
         |    CAST(sum(pos) OVER (ORDER BY decile DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_pos
         |  FROM bydec),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot_n,
         |  CAST(sum(pos) AS BIGINT) AS tot_pos FROM bydec)
         |SELECT decile, n, pos, cum_n, cum_pos,
         |  round(CAST(cum_pos * tot_n AS DOUBLE)
         |    / CAST(cum_n * tot_pos AS DOUBLE), 6) AS lift
         |FROM cum CROSS JOIN tot""".stripMargin
    },
  )

  /** Deterministic dense surrogate ids WITHOUT a global sort: keys fall
    * into arithmetic range buckets, each bucket sorts locally
    * (row_number over the bucket partition — parallel across buckets),
    * and bucket offsets are an exclusive prefix sum over the
    * |buckets|-row count table. id = offset + local_rank − 1 equals the
    * global dense rank exactly — the oracle states it as one
    * row_number() — but no stage ever sees more than a bucket's rows in
    * one ordered partition. The classic zipWithIndex layout, expressed
    * relationally.
    */
  private val surrogate = Q(
    "s31_surrogate_keys",
    (s, d) => {
      val p = Tables(s, d).part
        .select(col("p_partkey"), expr("p_partkey div 1000").as("bucket"))
      val counts = p.groupBy("bucket").agg(count(lit(1)).as("c"))
      val offsets = counts
        .withColumn("offset",
          coalesce(sum(col("c")).over(Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bucket", "offset")
      val local = Window.partitionBy("bucket").orderBy("p_partkey")
      p.withColumn("rk", row_number().over(local))
        .join(broadcast(offsets), "bucket")
        .select(col("p_partkey"),
          (col("offset") + col("rk") - 1L).as("surrogate_id"))
    },
    Some(
      """SELECT p_partkey,
        |  CAST(row_number() OVER (ORDER BY p_partkey) - 1 AS BIGINT)
        |    AS surrogate_id
        |FROM part""".stripMargin),
  )

  def all: Seq[Q] = Seq(target, lift, surrogate)
}
