package graft.sources

import graft.SparkSpec

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** S6: minimal-XLSX reader over a fixture workbook written with the
  * standard part layout (SOC-index-shaped: an index column, headers with
  * embedded newlines, shared strings, numeric cells, gaps, empty rows).
  */
class XlsxSourceSpec extends SparkSpec {

  private def writeFixture(): String = {
    val path = Files.createTempFile("soc_index", ".xlsx").toString
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    part("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets>
        |<sheet name="SOC2020 coding index" sheetId="1" r:id="rId1"/>
        |<sheet name="Notes" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships>
        |<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst>
        |<si><t>SOC2020</t></si>
        |<si><t>SOC2020 Group
        |Title</t></si>
        |<si><t>chief executives</t></si>
        |<si><r><t>senior </t></r><r><t>officials</t></r></si>
        |</sst>""".stripMargin)
    // row 1: idx col (A) + headers (B, C); row 2-3 data; row 4 empty;
    // row 5 has a gap in column B
    part("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>0</v></c>
        |  <c r="C1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>1115</v></c>
        |  <c r="C2" t="s"><v>2</v></c></row>
        |<row r="3"><c r="A3"><v>2</v></c><c r="B3"><v>1116</v></c>
        |  <c r="C3" t="inlineStr"><is><t>directors</t></is></c></row>
        |<row r="4"></row>
        |<row r="5"><c r="A5"><v>3</v></c>
        |  <c r="C5" t="s"><v>3</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    part("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    path
  }

  test("reads the SOC sheet: cleaned headers, idx col skipped, gaps null") {
    val df = XlsxSource.read(spark, writeFixture(), "SOC2020 coding index")
    assert(df.columns.toSeq == Seq("SOC2020", "SOC2020 Group Title"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 3) // empty row dropped
    assert(rows(0) == ("1115", "chief executives"))
    assert(rows(1) == ("1116", "directors")) // inlineStr cell
    assert(rows(2) == (null, "senior officials")) // gap + rich-text run
  }

  test("missing sheet raises a named error") {
    val e = intercept[RuntimeException] {
      XlsxSource.read(spark, writeFixture(), "No Such Sheet")
    }
    assert(e.getMessage.contains("No Such Sheet"))
  }
}
