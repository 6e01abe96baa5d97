package graft.sources

import graft.Q

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Deterministic SOC-index-shaped workbook for the S6 CORRECTNESS row
  * (ref labs/soc/metadata_utils.py:113-126: sheet → header row cleaned,
  * index column skipped, rows keyed by header, empty rows dropped).
  *
  * The workbook is written with the standard part layout — shared
  * strings (plain and rich-text runs), inline strings, numeric cells, a
  * gap cell, an empty row, a decoy second sheet — so the oracle VALUES
  * literal below checks the REAL parser against an independent
  * expectation, not a round-trip of itself. Headers are parquet-safe
  * (the verify gate writes the result as parquet).
  */
object XlsxFixture {

  val SheetName = "SOC2020 coding index"

  private val parts = Seq(
    "xl/workbook.xml" ->
      """<?xml version="1.0"?><workbook><sheets>
        |<sheet name="SOC2020 coding index" sheetId="1" r:id="rId1"/>
        |<sheet name="Notes" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      """<?xml version="1.0"?><Relationships>
        |<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin,
    "xl/sharedStrings.xml" ->
      """<?xml version="1.0"?><sst>
        |<si><t>soc2020</t></si>
        |<si><t>soc_title</t></si>
        |<si><t>chief executives</t></si>
        |<si><r><t>senior </t></r><r><t>officials</t></r></si>
        |<si><t>production managers</t></si>
        |</sst>""".stripMargin,
    "xl/worksheets/sheet1.xml" ->
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
        |<row r="6"><c r="A6"><v>4</v></c><c r="B6"><v>1121</v></c>
        |  <c r="C6" t="s"><v>4</v></c></row>
        |<row r="7"><c r="A7"><v>5</v></c><c r="B7"><v>1122</v></c>
        |  <c r="C7" t="s"><v>4</v></c></row>
        |</sheetData></worksheet>""".stripMargin,
    "xl/worksheets/sheet2.xml" ->
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin,
  )

  /** Write the workbook once per content version: the filename carries a
    * hash of the parts, so editing the fixture republishes instead of
    * replaying a stale copy from a previous checkout.
    */
  def path(): String = {
    val contentKey = java.security.MessageDigest.getInstance("MD5")
      .digest(parts.map { case (n, c) => s"$n=$c" }.mkString("\n")
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val p = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_soc_index_fixture_$contentKey.xlsx")
    if (!Files.exists(p)) {
      val tmp = Files.createTempFile("graft_soc_index", ".xlsx")
      val zos = new ZipOutputStream(new FileOutputStream(tmp.toFile))
      parts.foreach { case (name, content) =>
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8")); zos.closeEntry()
      }
      zos.close()
      try Files.move(tmp, p)
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp) } // racing writer won with same bytes
    }
    p.toString
  }

  private val q = Q(
    "s6_xlsx",
    (s, _) => XlsxSource.read(s, path(), SheetName),
    // independent expectation, NOT derived from the parser: header from
    // row 1 minus the index column; empty row 4 dropped; row 5's gap in
    // column B surfaces as NULL; shared-string entry 3 is rich-text runs
    // that concatenate; entry 4 is referenced by two rows
    Some(
      """SELECT * FROM (VALUES
        |  ('1115', 'chief executives'),
        |  ('1116', 'directors'),
        |  (NULL,   'senior officials'),
        |  ('1121', 'production managers'),
        |  ('1122', 'production managers'))
        |AS t(soc2020, soc_title)""".stripMargin),
  )

  def queries: Seq[Q] = Seq(q)
}
