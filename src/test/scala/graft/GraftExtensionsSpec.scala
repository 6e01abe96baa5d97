package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions are reachable from pure SQL via
  * SparkSessionExtensions registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .withExtensions(new GraftExtensions) // honoured on a fresh JVM
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s) // honoured even on a reused session
    s
  }

  test("SQL surface: sketches, jaccard, vector ops") {
    val row = spark.sql(
      """SELECT
        |  rolling_hash('abc') AS rh,
        |  simhash64('a b c') AS sh,
        |  size(minhash_signature('a b c d')) AS msize,
        |  jaccard_sorted(sorted_shingle_hashes('a b c', 2),
        |                 sorted_shingle_hashes('a b c', 2)) AS j,
        |  vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |  vec_l1(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS l1
        |""".stripMargin).head()
    import org.apache.spark.unsafe.types.UTF8String
    assert(row.getLong(0) ==
      graft.functions.RollingHash.hash(UTF8String.fromString("abc")))
    assert(row.getLong(1) ==
      graft.functions.TextSketches.simhash64(UTF8String.fromString("a b c")))
    assert(row.getInt(2) == 64)
    assert(row.getDouble(3) == 1.0)
    assert(row.getDouble(4) == 11.0)
    assert(row.getDouble(5) == 4.0)
  }

  test("SQL surface: hash-family and normalisation functions") {
    import org.apache.spark.unsafe.types.UTF8String
    val row = spark.sql(
      """SELECT hll_hash('abc') AS hh, fnv1a64('abc') AS fn,
        |  nfc_normalize('café') AS nfc""".stripMargin).head()
    assert(row.getLong(0) ==
      graft.functions.TextSketches.hllHash(UTF8String.fromString("abc")))
    assert(row.getLong(1) ==
      graft.functions.TextSketches.fnv1a64(UTF8String.fromString("abc")))
    assert(row.getString(2) == "café")
  }

  test("SQL surface: hilbert_key matches the static walk") {
    val row = spark.sql("SELECT hilbert_key(17L, 200L) AS hk").head()
    assert(row.getLong(0) == graft.functions.Hilbert.xy2d(17L, 200L))
  }

  test("planner surface: the as-of strategy is injected") {
    // the extensions-built (or register()-patched) session must claim
    // AsOfJoinPlan nodes without an explicit AsOfJoin.register call
    graft.plans.AsOfJoin.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val l = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val r = Seq((1L, 5L, 200L)).toDF("rk", "rt", "rid")
    val got = graft.plans.AsOfJoin
      .backward(l, r, "k", "rk", "t", "rt")
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.toSeq == Seq((100L, 200L)))
  }
}
