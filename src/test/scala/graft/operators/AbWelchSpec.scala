package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A planted treatment effect must produce a large positive z; a null
  * effect must not.
  */
class AbWelchSpec extends SparkSpec {
  import spark.implicits._

  test("welch z detects a planted lift and stays flat under the null") {
    val dir = java.nio.file.Files.createTempDirectory("ab").toString
    // "lifted": treatment (odd user_id) pays +10 on a low-noise base;
    // "null": both variants identical distribution
    val rows = (0 until 400).map { i =>
      val variant = i % 2
      val base = 50.0 + (i % 5)
      val lifted = if (variant == 1) base + 10 else base
      (i.toLong, 0L, i.toLong, "lifted", lifted, "{}")
    } ++ (0 until 400).map { i =>
      (1000L + i, 0L, i.toLong, "nullcase", 50.0 + (i % 5), "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = graft.Registry.byName("a34_ab_welch").run(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(7)))
      .toMap
    val (nc, nt, mc, mt, z) = got("lifted")
    assert(nc == 200 && nt == 200)
    assert(math.abs(mt - mc - 10.0) < 0.5, s"lift ≈ 10, got ${mt - mc}")
    assert(z > 10, s"planted effect must be loud, z=$z")
    val (_, _, mc0, mt0, z0) = got("nullcase")
    assert(math.abs(mt0 - mc0) < 0.5 && math.abs(z0) < 2,
      s"null case stays quiet, z=$z0")
  }
}
