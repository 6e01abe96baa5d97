package graft.dedup

import graft.SparkSpec
import graft.functions.TextSketches
import org.apache.spark.sql.functions._

/** Integer-unit PageRank: the engine must reproduce the exact integer
  * recurrence a reference in-memory loop computes, independent of
  * partitioning.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference of the spec'd recurrence. */
  private def reference(edges: Seq[(Long, Long)], nodes: Seq[Long],
      iters: Int): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = nodes.map(_ -> PageRank.BaseUnits).toMap
    for (_ <- 1 to iters) {
      val in = edges
        .groupBy(_._2)
        .view.mapValues(_.map { case (s, _) => rank(s) / outdeg(s) }.sum)
        .toMap
      rank = nodes.map(n => n -> (150000L + 85L * in.getOrElse(n, 0L) / 100L))
        .toMap
    }
    rank
  }

  test("matches the integer recurrence on a chain + isolated node") {
    // path 1-2-3-4 (symmetric) + isolated node 9
    val fwd = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val sym = fwd ++ fwd.map(_.swap)
    val nodes = Seq(1L, 2L, 3L, 4L, 9L)
    val got = PageRank.run(
      sym.toDF("src", "dst"), nodes.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = reference(sym, nodes, PageRank.Iterations)
    assert(got == want)
    // chain interiors accumulate more mass than endpoints; isolated
    // nodes settle at the damped floor
    assert(got(2L) > got(1L) && got(3L) > got(4L))
    assert(got(9L) == 150000L)
  }

  test("partitioning-independent") {
    val fwd = (1L to 40L).map(i => (i, i % 40 + 1)) // ring
    val sym = fwd ++ fwd.map(_.swap)
    val nodes = (1L to 40L)
    val a = PageRank.run(sym.toDF("src", "dst").repartition(7),
      nodes.toDF("id")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = PageRank.run(sym.toDF("src", "dst").repartition(2),
      nodes.toDF("id")).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
    // a symmetric ring is vertex-transitive: every node must land on the
    // same rank, and the damped-floor fixpoint of x = 150000 + 0.85x
    // truncates just below 1e6 units
    assert(a.map(_._2).distinct.length == 1)
    assert(math.abs(a.head._2 - 1000000L) < 5000)
  }
}

/** fmix64 + the HLL hash: the finalizer must match an independently
  * computed BigInt reference, and the combined hash must de-bias the
  * rank statistic FNV alone skews.
  */
class HllHashSpec extends SparkSpec {

  private def refFmix(h0: BigInt): BigInt = {
    val m = BigInt(1) << 64
    def u(x: BigInt) = x.mod(m)
    var h = u(h0)
    h = h ^ (h >> 33)
    h = u(h * BigInt("18397679294719823053")) // 0xff51afd7ed558ccd
    h = h ^ (h >> 33)
    h = u(h * BigInt("14181476777654086739")) // 0xc4ceb9fe1a85ec53
    h = h ^ (h >> 33)
    h
  }

  test("fmix64 matches a BigInt reference on edge values") {
    for (v <- Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue,
        1469598103934665603L, 42L)) {
      val want = refFmix(BigInt(v) & BigInt("FFFFFFFFFFFFFFFF", 16))
      val got = BigInt(TextSketches.fmix64(v)) & BigInt("FFFFFFFFFFFFFFFF", 16)
      assert(got == want, s"fmix64($v)")
    }
  }

  test("hll estimate on sequential ids is within 3 sigma") {
    import spark.implicits._
    // the exact failure mode the finalizer fixes: sequential numeric keys
    val n = 20000
    val df = (1 to n).map(_.toString).toDF("k")
    val h = TextSketches.hll_hash(col("k"))
    val est = df
      .select(col("k"), h.bitwiseAND(lit(511L)).as("b"),
        shiftrightunsigned(h, 9).as("w"))
      .select(col("b"), expr(
        (1 to 55).map(r => s"WHEN w >= ${1L << (55 - r)} THEN $r")
          .mkString("CASE ", " ", " ELSE 56 END")).as("rho"))
      .groupBy("b").agg(max("rho").as("m"))
      .collect().map(r => r.getInt(1))
    val seen = est.length
    val s = est.map(m => math.pow(2.0, -m)).sum + (512 - seen)
    val e = 0.7213 / (1 + 1.079 / 512.0) * 512 * 512 / s
    assert(math.abs(e - n) / n < 3 * 1.04 / math.sqrt(512.0),
      s"estimate $e for $n")
  }
}
