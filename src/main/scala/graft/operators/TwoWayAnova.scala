package graft.operators

import graft.{Q, Tables}
import graft.util.Stable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Two-way ANOVA (cell-means decomposition) — does order value
  * respond to priority, to market segment, and crucially to their
  * INTERACTION (the question one-way ANOVA can't ask):
  *
  *   SS_A     = Σ_a S_a²/n_a − S²/N
  *   SS_B     = Σ_b S_b²/n_b − S²/N
  *   SS_cells = Σ_ab S_ab²/n_ab − S²/N
  *   SS_AB    = SS_cells − SS_A − SS_B
  *   SS_E     = Σx² − Σ_ab S_ab²/n_ab
  *
  * (the balanced-design decomposition; near-proportional TPC-H cell
  * counts keep it honest, and the F ratios use the exact cell
  * moments either way). Cell sums stay DECIMAL — margins are sums of
  * cell decimals, so every Σ and S_a is EXACT; each S²/n term is one
  * IEEE chain and the ≤25-term reductions are decimal-stable.
  *
  * Shape: customer dim broadcast into orders, ONE aggregate to the
  * 25-cell grid (carrying Σx² alongside); margins and the finale are
  * grid arithmetic. One fact scan at any scale.
  */
object TwoWayAnova {

  private val q = Q(
    "a86_two_way_anova",
    (s, d) => {
      val t = Tables(s, d)
      val dec2 = DecimalType(30, 2)
      val dec4 = DecimalType(30, 4)
      val cells = t.orders
        .join(broadcast(t.customer),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority").as("a"),
          col("c_mktsegment").as("b"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec2)).as("sx"),
          sum((col("o_totalprice") * col("o_totalprice")).cast(dec4))
            .as("sxx"))
        .localCheckpoint(false)
      def margin(key: String) = cells.groupBy(key)
        .agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"))
        .agg(Stable.dsum(col("sx").cast("double") *
          col("sx").cast("double") / col("n").cast("double"), 0)
          .as(s"ss_$key"))
      val grand = cells.agg(sum(col("n")).as("nn"),
        sum(col("sx")).cast("double").as("s"),
        sum(col("sxx")).cast("double").as("q"),
        Stable.dsum(col("sx").cast("double") * col("sx").cast("double")
          / col("n").cast("double"), 0).as("cellterm"))
      val fin = grand
        .crossJoin(broadcast(margin("a")))
        .crossJoin(broadcast(margin("b")))
        .select(col("nn").as("n"),
          (col("ss_a") - col("s") * col("s") / col("nn").cast("double"))
            .as("ssa"),
          (col("ss_b") - col("s") * col("s") / col("nn").cast("double"))
            .as("ssb"),
          (col("cellterm") - col("s") * col("s") /
            col("nn").cast("double")).as("sscells"),
          (col("q") - col("cellterm")).as("sse"))
      fin.select(col("n"), round(col("ssa"), 4).as("ss_a"),
        round(col("ssb"), 4).as("ss_b"),
        round(col("sscells") - col("ssa") - col("ssb"), 4).as("ss_ab"),
        round(col("sse"), 4).as("ss_err"),
        round((col("ssa") / lit(4.0)) /
          (col("sse") / (col("n") - 25).cast("double")), 6).as("f_a"),
        round((col("ssb") / lit(4.0)) /
          (col("sse") / (col("n") - 25).cast("double")), 6).as("f_b"),
        round(((col("sscells") - col("ssa") - col("ssb")) / lit(16.0)) /
          (col("sse") / (col("n") - 25).cast("double")), 6)
          .as("f_ab"))
    },
    Some(
      s"""WITH cells AS (
         |  SELECT o_orderpriority AS a, c_mktsegment AS b,
         |    count(*) AS n,
         |    sum(CAST(o_totalprice AS DECIMAL(30,2))) AS sx,
         |    sum(CAST(o_totalprice * o_totalprice AS DECIMAL(30,4)))
         |      AS sxx
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |ma AS (
         |  SELECT ${Stable.dsumSql(
               "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)" +
                 " / CAST(n AS DOUBLE)", 0)} AS ss_a
         |  FROM (SELECT a, CAST(sum(n) AS BIGINT) AS n, sum(sx) AS sx
         |        FROM cells GROUP BY 1) t),
         |mb AS (
         |  SELECT ${Stable.dsumSql(
               "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)" +
                 " / CAST(n AS DOUBLE)", 0)} AS ss_b
         |  FROM (SELECT b, CAST(sum(n) AS BIGINT) AS n, sum(sx) AS sx
         |        FROM cells GROUP BY 1) t),
         |grand AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS nn,
         |    CAST(sum(sx) AS DOUBLE) AS s,
         |    CAST(sum(sxx) AS DOUBLE) AS q,
         |    ${Stable.dsumSql(
               "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)" +
                 " / CAST(n AS DOUBLE)", 0)} AS cellterm
         |  FROM cells),
         |fin AS (
         |  SELECT nn AS n,
         |    ss_a - s * s / CAST(nn AS DOUBLE) AS ssa,
         |    ss_b - s * s / CAST(nn AS DOUBLE) AS ssb,
         |    cellterm - s * s / CAST(nn AS DOUBLE) AS sscells,
         |    q - cellterm AS sse
         |  FROM grand CROSS JOIN ma CROSS JOIN mb)
         |SELECT n, round(ssa, 4) AS ss_a, round(ssb, 4) AS ss_b,
         |  round(sscells - ssa - ssb, 4) AS ss_ab,
         |  round(sse, 4) AS ss_err,
         |  round((ssa / 4.0) / (sse / CAST(n - 25 AS DOUBLE)), 6) AS f_a,
         |  round((ssb / 4.0) / (sse / CAST(n - 25 AS DOUBLE)), 6) AS f_b,
         |  round(((sscells - ssa - ssb) / 16.0)
         |    / (sse / CAST(n - 25 AS DOUBLE)), 6) AS f_ab
         |FROM fin""".stripMargin),
  )

  def all: Seq[Q] = Seq(q)
}
