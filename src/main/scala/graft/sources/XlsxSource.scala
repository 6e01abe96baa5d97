package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.Element

import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory
import scala.collection.mutable.ArrayBuffer

/** S6 — spreadsheet ingest for lookup dimensions (the reference pulls the
  * ONS SOC index from a remote workbook, labs/soc/metadata_utils.py:
  * 113-126: sheet → header row with newlines cleaned, index column
  * skipped, remaining rows keyed by header, empty rows dropped).
  *
  * An .xlsx is a zip of XML parts; this reads one with the JDK only (no
  * POI dependency): workbook.xml + rels resolve the sheet name to its
  * part, sharedStrings.xml resolves `t="s"` cells, and rows become one
  * all-string DataFrame with the reference's header conventions. Lookup
  * dimensions are small by construction (the XLSX format caps at ~1M
  * rows), so a driver-side parse feeding a broadcast-join dim is the
  * right distribution shape — the big side of any join with this table
  * never moves.
  */
object XlsxSource {

  private def dom(zip: ZipFile, entryName: String): Option[Element] =
    Option(zip.getEntry(entryName)).map { e =>
      val f = DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(false)
      f.newDocumentBuilder().parse(zip.getInputStream(e)).getDocumentElement
    }

  private def elems(parent: Element, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** "BC12" → 0-based column index 54. */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private def sheetPart(zip: ZipFile, sheetName: String): String = {
    val wb = dom(zip, "xl/workbook.xml")
      .getOrElse(sys.error("not an xlsx: missing xl/workbook.xml"))
    val rid = elems(wb, "sheet")
      .find(_.getAttribute("name") == sheetName)
      .map(_.getAttribute("r:id"))
      .getOrElse(sys.error(s"sheet '$sheetName' not found"))
    val rels = dom(zip, "xl/_rels/workbook.xml.rels")
      .getOrElse(sys.error("missing workbook rels"))
    val target = elems(rels, "Relationship")
      .find(_.getAttribute("Id") == rid)
      .map(_.getAttribute("Target"))
      .getOrElse(sys.error(s"no relationship for $rid"))
    if (target.startsWith("/")) target.drop(1) else s"xl/$target"
  }

  private def sharedStrings(zip: ZipFile): IndexedSeq[String] =
    dom(zip, "xl/sharedStrings.xml") match {
      case None => IndexedSeq.empty
      case Some(sst) =>
        // an <si> is either one <t> or rich-text runs of <r><t>; text
        // content of all nested <t>s concatenated covers both
        elems(sst, "si").map(si => elems(si, "t").map(_.getTextContent)
          .mkString).toIndexedSeq
    }

  /** One parsed row: 0-based column index → cell string value. */
  private def cells(row: Element, sst: IndexedSeq[String]): Map[Int, String] =
    elems(row, "c").flatMap { c =>
      val idx = colIndex(c.getAttribute("r"))
      val v = c.getAttribute("t") match {
        case "s" =>
          elems(c, "v").headOption.map(e => sst(e.getTextContent.trim.toInt))
        case "inlineStr" => elems(c, "t").headOption.map(_.getTextContent)
        case _ => elems(c, "v").headOption.map(_.getTextContent)
      }
      v.map(idx -> _)
    }.toMap

  /** Read `sheetName` of the workbook at `path` into an all-string
    * DataFrame: header = first row minus the index column, newlines
    * replaced by spaces (the reference's head_cleaning); subsequent rows
    * align by cell reference; rows with no populated cells drop out.
    */
  def read(spark: SparkSession, path: String, sheetName: String,
      headCleaning: String => String = _.replace("\n", " ")): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val sst = sharedStrings(zip)
      val sheet = dom(zip, sheetPart(zip, sheetName))
        .getOrElse(sys.error("missing sheet part"))
      val rows = elems(sheet, "row").map(cells(_, sst))
      require(rows.nonEmpty, s"sheet '$sheetName' is empty")
      // header: first row, skipping spreadsheet column 0 (the idx col)
      val header = rows.head.toSeq.filter(_._1 >= 1).sortBy(_._1)
        .map { case (i, v) => i -> headCleaning(v) }
      val data = new ArrayBuffer[Row]
      rows.tail.foreach { r =>
        val vals = header.map { case (i, _) => r.get(i).orNull }
        if (vals.exists(_ != null)) data += Row.fromSeq(vals)
      }
      val schema = StructType(header.map { case (_, h) =>
        StructField(h, StringType, nullable = true) })
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq, 1), schema)
    } finally zip.close()
  }
}
