package graft.sources

import graft.Q
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType, StructField, StructType}

/** Malformed-record recovery on CSV ingest — the messy-feed side of the
  * ingest contract family (s24 quarantines rows that FAIL RULES; this
  * quarantines rows that fail to PARSE): `mode=PERMISSIVE` with
  * `columnNameOfCorruptRecord` keeps the pipeline flowing while every
  * unparseable line survives VERBATIM for the dead-letter queue, instead
  * of `FAILFAST` (one bad line kills a 100 TB load) or `DROPMALFORMED`
  * (bad lines vanish without audit trail).
  *
  * The fixture feed (staged deterministically like the XLSX fixture)
  * exercises the parser's actual recovery semantics, each pinned by the
  * independent VALUES oracle:
  *   - clean rows parse;
  *   - a non-numeric value in a typed column → the OTHER fields survive
  *     (partial-results mode), the bad field is null, and the raw line
  *     is captured;
  *   - too MANY columns → the schema prefix parses AND the row is
  *     flagged (recoverable data, auditable anomaly);
  *   - too FEW columns → null-padded AND flagged;
  *   - quoted delimiters parse as data.
  *
  * Scale shape: parsing is a map stage; the corrupt column rides the
  * scan. Reference anchor: the curate loaders standardise scraped chunks
  * row-by-row and skip nulls (`tasks/extract.py:117-126`) — recovery
  * there is implicit row dropping; here it is an auditable column.
  */
object CsvRecovery {

  private val lines = Seq(
    "id,name,amount",
    "1,alpha,10.5",
    "2,beta,oops",            // bad double -> corrupt
    "3,gamma,30.25",
    "4,delta,1.5,EXTRA",      // too many columns -> corrupt
    "5,\"comma, inc\",2.5",   // quoted delimiter -> data
    "6,epsilon",              // too few columns -> null-padded, NOT corrupt
  )

  private[sources] def stage(): String = {
    val body = lines.mkString("\n")
    val dir = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_csv_fixture", Integer.toHexString(body.hashCode))
    Files.createDirectories(dir)
    val f = dir.resolve("feed.csv")
    if (!Files.exists(f)) {
      val tmp = Files.createTempFile(dir, "feed", ".tmp")
      Files.writeString(tmp, body)
      Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    f.toString
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("amount", DoubleType),
    StructField("_bad", StringType)))

  private val q = Q(
    "s26_csv_malformed_recovery",
    (s, _) => {
      val df = s.read
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .schema(schema)
        .csv(stage())
      df.select(col("id"), col("name"),
        expr("CAST(round(amount * 100) AS BIGINT)").as("amount_cents"),
        col("_bad").isNotNull.as("quarantined"),
        coalesce(col("_bad"), lit("")).as("raw_line"))
    },
    Some(
      """SELECT * FROM (VALUES
        |  (1, 'alpha', CAST(1050 AS BIGINT), false, ''),
        |  (2, 'beta', CAST(NULL AS BIGINT), true, '2,beta,oops'),
        |  (3, 'gamma', CAST(3025 AS BIGINT), false, ''),
        |  (4, 'delta', CAST(150 AS BIGINT), true, '4,delta,1.5,EXTRA'),
        |  (5, 'comma, inc', CAST(250 AS BIGINT), false, ''),
        |  (6, 'epsilon', CAST(NULL AS BIGINT), true, '6,epsilon')
        |) AS t(id, name, amount_cents, quarantined, raw_line)"""
        .stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
