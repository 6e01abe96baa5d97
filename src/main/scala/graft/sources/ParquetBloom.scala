package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Parquet bloom-filter authoring — the write-side option that makes
  * point-lookup scans skip row groups at 100 TB: with
  * `parquet.bloom.filter.enabled#<col>` set, every row group carries
  * a split-block bloom filter on the column, and a later
  * `key IN (...)` scan drops whole row groups whose filter misses —
  * min/max zonemaps (s27) can't do that for high-cardinality keys
  * whose ranges overlap every group. The query writes the part table
  * with a bloom on `p_partkey` (expected NDV sized from the table),
  * reads it back through a selective IN probe, and returns the
  * survivors — result identity with the direct filter is what the
  * oracle checks; the bloom changes I/O, never semantics.
  */
object ParquetBloom {

  private val Probe = Seq(17L, 4242L, 9999L, 12345L, 19997L)

  private val q = Q(
    "s37_parquet_bloom_roundtrip",
    (s, d) => {
      val out = Files.createTempDirectory("s37_bloom").toString
      Tables(s, d).part
        .select("p_partkey", "p_name", "p_retailprice")
        .write
        .option("parquet.bloom.filter.enabled#p_partkey", "true")
        .option("parquet.bloom.filter.expected.ndv#p_partkey", "200000")
        // small row groups so the probe demonstrably has groups to skip
        .option("parquet.block.size", (1 << 20).toString)
        .mode(SaveMode.Overwrite).parquet(out)
      s.read.parquet(out)
        .filter(col("p_partkey").isin(Probe: _*))
    },
    Some(
      s"""SELECT p_partkey, p_name, p_retailprice FROM part
         |WHERE p_partkey IN (${Probe.mkString(", ")})""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
