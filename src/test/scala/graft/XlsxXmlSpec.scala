package graft

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Sources, XlsxSource, XmlSource}

/** S1 XLSX reading (real SpreadsheetML parts) and S3 XML→badgerfish
  * ingestion.
  */
class XlsxXmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def makeXlsx(path: String): Unit = {
    val parts = Seq(
      "xl/workbook.xml" ->
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |  <sheets>
          |    <sheet name="Data" sheetId="1" r:id="rId1"/>
          |    <sheet name="Empty" sheetId="2" r:id="rId2"/>
          |  </sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |  <Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
          |  <Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>
          |</Relationships>""".stripMargin,
      "xl/sharedStrings.xml" ->
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3">
          |  <si><t>name</t></si><si><t>qty</t></si><si><t>Sarah</t></si>
          |</sst>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <sheetData>
          |    <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>ok</t></is></c></row>
          |    <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c><c r="C2" t="b"><v>1</v></c></row>
          |    <row r="3"><c r="A3" t="inlineStr"><is><t>Terah</t></is></c><c r="C3" t="b"><v>0</v></c></row>
          |  </sheetData>
          |</worksheet>""".stripMargin,
      "xl/worksheets/sheet2.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <sheetData/>
          |</worksheet>""".stripMargin)
    val zos = new ZipOutputStream(new FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }

  test("xlsx: sheets keyed by header, shared/inline/number/bool cells, empty sheet dropped") {
    val dir = Files.createTempDirectory(Paths.get("target"), "xlsx")
    val path = dir.resolve("wb.xlsx").toString
    makeXlsx(path)
    val wb = XlsxSource.readWorkbook(spark, path)
    assert(wb.keySet == Set("Data")) // empty sheet dropped
    val df = wb("Data")
    assert(df.columns.toSeq == Seq("name", "qty", "ok"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(("Sarah", "42", "true"), ("Terah", null, "false")))
  }

  test("cells without the optional r reference fall back to sequential position") {
    val dir = Files.createTempDirectory(Paths.get("target"), "xlsxnr")
    val path = dir.resolve("wb.xlsx").toString
    // streaming writers legally omit r=; second row mixes explicit C with
    // two unreferenced leading cells
    val parts = Seq(
      "xl/workbook.xml" ->
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |  <sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |  <Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <sheetData>
          |    <row><c t="inlineStr"><is><t>a</t></is></c><c t="inlineStr"><is><t>b</t></is></c><c t="inlineStr"><is><t>c</t></is></c></row>
          |    <row><c><v>1</v></c><c><v>2</v></c><c r="C2"><v>3</v></c></row>
          |  </sheetData>
          |</worksheet>""".stripMargin)
    val zos = new ZipOutputStream(new FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    } finally zos.close()
    val df = XlsxSource.readWorkbook(spark, path)("S")
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    val row = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(row == Set(("1", "2", "3")))
  }

  test("column letters map to 0-based indices") {
    assert(XlsxSource.colIndex("A") == 0)
    assert(XlsxSource.colIndex("Z") == 25)
    assert(XlsxSource.colIndex("AA") == 26)
    assert(XlsxSource.colIndex("AB") == 27)
  }

  test("xml to badgerfish: attributes, repeated children, text content") {
    val json = XmlSource.toBadgerfishJson(
      """<person id="p1"><name>Isaac</name><child rank="0">Esau</child><child rank="1">Jacob</child></person>""")
    assert(json ==
      """{"person": {"@id": "p1", "name": {"$": "Isaac"}, "child": [{"@rank": "0", "$": "Esau"}, {"@rank": "1", "$": "Jacob"}]}}""")
  }

  test("xml to badgerfish: EMPTY document (no record elements) converts cleanly") {
    // the shape an empty shard produces upstream — EmptyInputSpec
    // excludes the source_xml queries because their fixture synthesis
    // yields exactly this document; the CONVERTER itself must handle it
    val json = XmlSource.toBadgerfishJson(
      graft.sources.SyntheticDocs.xmlDoc("nations", "nation", Seq.empty))
    assert(json == """{"nations": {}}""")
    // and self-closed / whitespace-only elements stay well-formed too
    assert(XmlSource.toBadgerfishJson("<nations/>") == """{"nations": {}}""")
  }

  test("xml file with xinclude resolves into a struct DataFrame") {
    val d = Files.createTempDirectory(Paths.get("target"), "xmlsrc")
    Files.writeString(d.resolve("root.xml"),
      """<family name="terah"><xi:include href="person.xml"/></family>""")
    Files.writeString(d.resolve("person.xml"), """<person id="p1">Isaac</person>""")
    val fr = new Sources.FileResolver(Seq(d.toString))
    val df = XmlSource.readXml(spark, fr, "root.xml")
    val row = df.select("family.@name", "family.person.$", "family.person.@id").collect().head
    assert((row.getString(0), row.getString(1), row.getString(2)) == (("terah", "Isaac", "p1")))
  }
}
