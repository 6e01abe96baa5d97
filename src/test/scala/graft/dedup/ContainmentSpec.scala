package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The relation containment exists for: a short excerpt inside a long
  * document, invisible to Jaccard at its own threshold.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("excerpt-of-source is found; unrelated docs are not") {
    val quote = (1 to 12).map(i => s"tok$i").mkString(" ")
    val long = quote + " " + (100 to 160).map(i => s"pad$i").mkString(" ")
    val other = (200 to 260).map(i => s"oth$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, long), (3L, other))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val cont = NgramJaccard.containmentPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(cont.length == 1)
    val (a, b, c) = cont.head
    assert(a == 1L && b == 2L && c >= 0.99, "quote fully contained")
    // and Jaccard at ITS threshold misses the same pair: the union is
    // dominated by the long side
    val jac = NgramJaccard.similarPairs(docs, 0.7, 5000).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }
}
