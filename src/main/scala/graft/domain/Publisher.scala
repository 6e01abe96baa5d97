package graft.domain

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField}

import java.nio.file.{Files, Paths}

/** S8 — the versioned JSON+CSV+datadict publisher
  * (flows/aggregate/common.py:330-394): each indicator table is written
  * as `{title}.json`, `{title}.csv` and `{title}_data_dict.txt` under
  * both `latest/` and `{version}/`.
  *
  * Indicator outputs are small by construction (hundreds of rows), so
  * `coalesce(1)` is correct here — the heavy lifting happened upstream.
  * Floats are rounded to 2 dp in the published artifacts, mirroring
  * `json_dumps(decimal_places=2)`.
  */
object Publisher {

  /** 2-dp output rounding (F13) applied to every double column, mirroring
    * the reference's `json_dumps(decimal_places=2)`; public so the
    * rounding contract is oracle-checkable (`dom_publish_rounded`).
    */
  def rounded(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map {
      case StructField(n, DoubleType, _, _) => round(col(n), 2).as(n)
      case f => col(f.name)
    }.toIndexedSeq: _*)

  def dataDict(df: DataFrame, title: String, description: String): String = {
    val header = Seq(title, "-" * title.length, "", description, "",
      "Fields:", "-------", "")
    val fields = df.schema.fields.map(f =>
      s"""- ${f.name} (${f.dataType.simpleString}): "${f.name} of this indicator"\n""")
    (header ++ fields).mkString("\n")
  }

  def saveData(df: DataFrame, outRoot: String, title: String,
      version: String, description: String = ""): Unit = {
    val out = rounded(df)
    for (v <- Seq("latest", version)) {
      val dir = s"$outRoot/$v"
      out.coalesce(1).write.mode(SaveMode.Overwrite).json(s"$dir/$title.json")
      out.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(s"$dir/$title.csv")
      Files.createDirectories(Paths.get(dir))
      Files.writeString(Paths.get(s"$dir/${title}_data_dict.txt"),
        dataDict(df, title, description))
    }
  }
}
