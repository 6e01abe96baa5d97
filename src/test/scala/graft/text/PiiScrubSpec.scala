package graft.text

import org.scalatest.funsuite.AnyFunSuite

class PiiScrubSpec extends AnyFunSuite {
  import PiiScrub.scrubString

  test("emails, IPs and phone numbers redact; order prevents partial eats") {
    assert(scrubString("mail me at jane.doe+x@corp.co.uk today")
      == "mail me at <EMAIL> today")
    assert(scrubString("host 192.168.0.1 responded")
      == "host <IP> responded")
    assert(scrubString("call +44 (0)20 7946-0958 now")
      == "call <PHONE> now")
    assert(scrubString("a@b.com 1.2.3.4 +1 555 0100 99")
      == "<EMAIL> <IP> <PHONE>")
  }

  test("clean text passes through untouched") {
    val s = "salary 32000 per annum, 3 days remote, team of 12"
    assert(scrubString(s) == s)
  }
}

/** t-closeness on a constructed table where the TVDs are exact
  * fractions: a concentrated group must flag, a representative one not.
  */
class TClosenessSpec extends graft.SparkSpec {
  import spark.implicits._

  test("concentrated group flags; globally-representative group passes") {
    val dir = java.nio.file.Files.createTempDirectory("tc").toString
    // group 1: 10 rows all in band 0; group 2: 10 band 0 + 10 band 1.
    // global = (20, 10)/30 → group-1 TVD = |1 − 2/3|/2 + |0 − 1/3|/2
    // = 1/3 → 333333 ppm (> 300000, skewed); group-2 TVD =
    // |1/2 − 2/3|/2 + |1/2 − 1/3|/2 = 1/6 → 166666 ppm (clean)
    val rows =
      (1 to 10).map(i => (i.toLong, "x", 1, 500.0, "SEG")) ++
        (11 to 20).map(i => (i.toLong, "x", 2, 500.0, "SEG")) ++
        (21 to 30).map(i => (i.toLong, "x", 2, 2500.0, "SEG"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = graft.Registry.byName("p13_t_closeness").run(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1, 333333L, true), (2, 166666L, false)),
      s"got ${got.toSeq}")
  }
}
