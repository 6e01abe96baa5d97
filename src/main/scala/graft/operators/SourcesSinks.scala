package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Source/sink surface (SURVEY §2.1): CSV/JSON ingest and the
  * JSON-chunk / versioned-dump sinks, demonstrated as write→read-back
  * round trips whose oracle is simply the source table (S3 keyset
  * pagination is subsumed by partitioned parquet scans — P1's plan shows
  * the pushed projection).
  */
object SourcesSinks {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val s5 = Q(
    "s5_csv_roundtrip",
    (s, d) => {
      // S5: header CSV ingest with explicit schema + encoding option
      // (ref flows/pre_enrich/location_lookup.py:27-40 reads latin-1 CSV)
      val out = tmp("s5_csv")
      Tables(s, d).region
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(out)
      s.read
        .schema(StructType(Seq(StructField("r_regionkey", IntegerType),
          StructField("r_name", StringType))))
        .option("header", "true").option("encoding", "UTF-8")
        .csv(out)
    },
    Some("SELECT r_regionkey, r_name FROM region"),
  )

  private val s7 = Q(
    "s7_json_roundtrip",
    (s, d) => {
      // S7: JSON chunk sink (ref flows/extract/reed.py:222-229) + S11
      // curate re-read into a declared schema
      val out = tmp("s7_json")
      Tables(s, d).nation
        .coalesce(1).write.mode(SaveMode.Overwrite).json(out)
      s.read
        .schema(StructType(Seq(StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType))))
        .json(out)
        .select("n_nationkey", "n_name", "n_regionkey")
    },
    Some("SELECT n_nationkey, n_name, n_regionkey FROM nation"),
  )

  private val s9 = Q(
    "s9_versioned_dump",
    (s, d) => {
      // S9/S10: versioned overwrite dump, then public read that strips
      // the audit column (ref tasks/dump.py:50-125, __version__ stamp)
      val out = tmp("s9_dump")
      graft.domain.Schema.writeVersioned(Tables(s, d).supplier, out, "vtest")
      val back = s.read.parquet(out)
      assert(back.columns.contains("__version__"))
      back.drop("__version__")
    },
    Some("SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"),
  )

  private val p7 = Q(
    "p7_bernoulli_sample",
    (s, d) =>
      // P7: seeded Bernoulli sampling (ref dqa/data_getters.py:73-74);
      // sampling is engine-specific → rows-only check, but the seed makes
      // it reproducible run-to-run
      Tables(s, d).orders.sample(withReplacement = false, 0.1, seed = 42)
        .select("o_orderkey"),
    None,
  )

  private val s1 = Q(
    "s1_binary_listing_scan",
    (s, d) =>
      // S1/S2: object-listing scan with lazy bodies — binaryFile source
      // subsumes the reference's paginated list_objects_v2 + body GET
      // (flows/extract/reed.py:167-179); content column pruned unless
      // selected, so a metadata-only query never reads the bytes
      s.read.format("binaryFile").load(s"$d/*.parquet")
        .select(element_at(split(col("path"), "/"), -1).as("file"),
          col("length")),
    None, // filesystem metadata — rows-only check
  )

  def all: Seq[Q] = Seq(s1, s5, s7, s9, p7)
}
