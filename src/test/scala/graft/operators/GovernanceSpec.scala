package graft.operators

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Policy compilation: actions, fail-closed drop, unknown-action error. */
class PolicyMaskingSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1L, "alice", 1234.5, "x"), (2L, "bob", -10.0, "y"))
    .toDF("id", "name", "bal", "extra")

  test("hash is deterministic and joinable, band floors, null suppresses") {
    val policy = Seq(("id", "keep"), ("name", "hash"), ("bal", "band:100"),
      ("extra", "null")).toDF("column", "action")
    val out = PolicyMasking.applyPolicy(df, policy).collect()
      .map(r => r.getLong(0) -> r).toMap
    // same input → same surrogate (joinability across tables)
    val again = PolicyMasking.applyPolicy(df, policy).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).getString(1) == again(1L))
    assert(out(1L).getString(1).length == 16)
    assert(out(1L).getString(1) != "alice")
    assert(out(1L).getDouble(2) == 1200.0)
    assert(out(2L).getDouble(2) == -100.0)
    assert(out(1L).isNullAt(3))
  }

  test("unlisted columns are dropped (fail-closed)") {
    val policy = Seq(("id", "keep")).toDF("column", "action")
    assert(PolicyMasking.applyPolicy(df, policy).columns.toSeq == Seq("id"))
  }

  test("unknown action fails loudly") {
    val policy = Seq(("id", "rot13")).toDF("column", "action")
    intercept[IllegalArgumentException] {
      PolicyMasking.applyPolicy(df, policy)
    }
  }
}

/** Chunk GC: reachability safety — a retained version never loses a
  * chunk; only truly unreferenced chunks are planned for deletion.
  */
class ChunkGcSpec extends SparkSpec {

  test("expired chunks are exactly the months the edits touched") {
    val dir = sf("sf0.001")
    val expired = Registry.byName("s29_chunk_gc_plan").run(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // the months containing a %997-dropped key are the ONLY ones whose
    // v1 chunk can differ from every retained version
    val touched = Tables(spark, dir).orders
      .filter(col("o_orderkey") % 997 === 0)
      .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long")).collect().map(_.getLong(0)).toSet
    assert(expired == touched)
    // safety: strictly fewer than all months are deleted (sharing works)
    val all = Tables(spark, dir).orders
      .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long")).distinct().count()
    assert(expired.size < all)
  }
}

/** RFM scores: quintile bounds, segment rules, determinism. */
class RfmSpec extends SparkSpec {

  test("scores are 1..5 quintiles and segments follow the rules") {
    val rows = Registry.byName("e_rfm_segments").run(spark, sf("sf0.001"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getInt(4), r.getInt(5), r.getInt(6))
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      val seg = r.getString(7)
      if (rs >= 4 && fs >= 4 && ms >= 4) assert(seg == "champion")
      else if (rs <= 2 && fs >= 3) assert(seg == "at_risk")
      else if (rs <= 2) assert(seg == "hibernating")
      else assert(seg == "regular")
    }
    // ntile balance: each score bucket within 1 of n/5
    val n = rows.length
    val byR = rows.groupBy(_.getInt(4)).view.mapValues(_.length)
    assert(byR.values.forall(c => math.abs(c - n / 5.0) <= 1))
  }
}

/** Trimmed/winsorized means: robustness to an injected outlier. */
class TrimmedMeanSpec extends SparkSpec {

  test("trimmed and winsorized sit inside the raw range and resist tails") {
    val rows = Registry.byName("a40_trimmed_mean").run(spark, sf("sf0.001"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p05 = r.getDouble(1); val p95 = r.getDouble(2)
      val trimmed = r.getDouble(5); val wins = r.getDouble(6)
      assert(p05 <= p95)
      assert(trimmed >= p05 && trimmed <= p95)
      assert(wins >= p05 && wins <= p95)
      assert(r.getLong(4) > 0)
    }
  }
}
