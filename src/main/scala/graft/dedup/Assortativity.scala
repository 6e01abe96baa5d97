package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Degree assortativity (Newman 2002) over the shared co-occurrence
  * graph — the one-number answer to "do hubs link to hubs?", which
  * decides how the OTHER graph operators behave at scale: a strongly
  * assortative graph concentrates `d11_pagerank` mass and makes the
  * `d13_kcore` inner shells dense, while a disassortative one is where
  * the degree-oriented wedge join in `d12_triangle_count` wins big.
  * Profiling the graph before choosing iteration budgets is exactly
  * what this is for.
  *
  * r = Pearson correlation of (deg(u), deg(v)) over the DIRECTED edge
  * set (each undirected edge in both orientations, the standard
  * convention — it symmetrizes the correlation). All five moment sums
  * are EXACT: degrees are integers, products are accumulated as
  * DECIMAL(38,0) (128-bit in both engines; a long would already be
  * within 10× of overflow at 100 TB edge counts), and the only floats
  * are one fixed cast-multiply-sqrt-divide chain at the end — the same
  * IEEE ops in the same order on both engines, hence bit-exact with no
  * rounding scaffolding.
  *
  * Shape: reads the cached edge list ([[CoocGraph.undirected]] — built
  * once, shared with d11/d12/d13/d14/d17/d21/d22), one degree
  * aggregation, two broadcast-size joins of degrees onto edges, one
  * global single-row aggregate with map-side combine. Nothing iterative,
  * nothing pairwise.
  */
object Assortativity {

  private val dec = DecimalType(38, 0)

  /** @param und undirected edge list (src, dst), canonical. Returns one
    * row (n_directed_edges, r_assortativity); r is NULL on a
    * degree-regular graph, where the correlation is undefined (zero
    * variance — and ANSI engines rightly refuse the 0/0).
    */
  def run(und: DataFrame): DataFrame = {
    // lazy lineage cut: `und` (for the registered query a DISTINCT over
    // the fact table) is consumed FOUR times in this plan — the union
    // doubles it and the deg/e branches are alias-distinct, so runtime
    // exchange reuse never fires and the distinct build executed 4×
    // (opt guide §2.4). One materialisation, shared by every consumer;
    // the frame is the edge list (node-bounded × 2 longs), the same
    // trade the lof/a32/j28 cuts made.
    val cut = und.localCheckpoint(false)
    val sym = cut.select(col("src").as("a"), col("dst").as("b"))
      .union(cut.select(col("dst").as("a"), col("src").as("b")))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
      .select(col("a").as("n"), col("deg"))
    val e = sym
      .join(deg.select(col("n").as("a"), col("deg").as("dx")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("dy")), "b")
    val agg = e.agg(
      count(lit(1)).cast(dec).as("m"),
      sum(col("dx").cast(dec)).as("sx"),
      sum(col("dy").cast(dec)).as("sy"),
      sum(col("dx").cast(dec) * col("dy").cast(dec)).as("sxy"),
      sum(col("dx").cast(dec) * col("dx").cast(dec)).as("sxx"),
      sum(col("dy").cast(dec) * col("dy").cast(dec)).as("syy"))
    agg.select(
      col("m").cast("long").as("n_directed_edges"),
      when(col("m") * col("sxx") - col("sx") * col("sx") =!= 0,
        (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("m") * col("syy") - col("sy") * col("sy")).cast("double")))
        .as("r_assortativity"))
  }

  /** Registered over the part–supplier incidence graph (distinct
    * (l_partkey, l_suppkey) pairs, supplier ids offset into their own
    * node range) rather than the shared supplier co-occurrence graph:
    * the dense test fixture makes the cooc graph degree-REGULAR
    * (complete at small SF), where assortativity is undefined — the
    * incidence graph has genuine degree variance at every SF, so the
    * oracle exercises the real arithmetic. [[run]] itself accepts any
    * edge list, the cooc graph included.
    */
  private val q = Q(
    "d23_assortativity",
    (s, d) => run(Tables(s, d).lineitem
      .select(col("l_partkey").as("src"),
        (col("l_suppkey") + 10000000L).as("dst"))
      .distinct()),
    Some(
      """WITH und AS (
        |  SELECT DISTINCT l_partkey AS src, l_suppkey + 10000000 AS dst
        |  FROM lineitem),
        |sym AS (SELECT src AS a, dst AS b FROM und
        |        UNION ALL SELECT dst, src FROM und),
        |deg AS (SELECT a AS n, count(*) AS deg FROM sym GROUP BY 1),
        |e AS (
        |  SELECT da.deg AS dx, db.deg AS dy
        |  FROM sym JOIN deg da ON sym.a = da.n
        |           JOIN deg db ON sym.b = db.n),
        |agg AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS m,
        |    sum(CAST(dx AS HUGEINT)) AS sx,
        |    sum(CAST(dy AS HUGEINT)) AS sy,
        |    sum(CAST(dx AS HUGEINT) * CAST(dy AS HUGEINT)) AS sxy,
        |    sum(CAST(dx AS HUGEINT) * CAST(dx AS HUGEINT)) AS sxx,
        |    sum(CAST(dy AS HUGEINT) * CAST(dy AS HUGEINT)) AS syy
        |  FROM e)
        |SELECT CAST(m AS BIGINT) AS n_directed_edges,
        |  CASE WHEN m * sxx - sx * sx <> 0 THEN
        |    CAST(m * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(m * sxx - sx * sx AS DOUBLE) *
        |           CAST(m * syy - sy * sy AS DOUBLE)) END
        |    AS r_assortativity
        |FROM agg""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
