package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain inner join on skewed data") {
    // one pathological key carrying 90% of rows
    val skewed = ((1 to 900).map(i => ("hot", s"v$i")) ++
      (1 to 100).map(i => (s"k${i % 10}", s"w$i"))).toDF("key", "payload")
    val dim = Seq(("hot", 1), ("k1", 2), ("k2", 3)).toDF("key", "dim_val")

    val plain = skewed.join(dim, "key")
      .select("key", "payload", "dim_val").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val salted = SkewJoin.saltedJoin(skewed, dim, "key", salts = 8)
      .select("key", "payload", "dim_val").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(salted == plain)
    assert(plain.size == 900 + 10 + 10)
  }
}
