package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Deterministic in-memory document synthesis for the XLSX/XML source
  * oracle queries: the driver testdata ships no .xlsx/.xml files, so the
  * correctness gate builds REAL documents from parquet-derived rows at
  * query time and round-trips them through [[XlsxSource]] /
  * [[XmlSource]] — proving the parsers against an oracle that reads the
  * same rows straight from parquet.
  *
  * Everything here is driver-side by design: workbooks and XML configs
  * are small control inputs in the reference too (in-memory buffers,
  * `cpx.convert(buffer, xlsx-mimetype)`, src/main/index.js:143-159) —
  * this is the one place the repo materializes rows on the driver, and
  * it is fixture synthesis, not a data path.
  */
object SyntheticDocs {

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }

  /** A minimal-but-real SpreadsheetML workbook: one sheet, inline-string
    * cells, header row first. Cells intentionally omit the optional `r`
    * reference so the positional-fallback parse path is exercised.
    */
  def xlsxBytes(sheetName: String, header: Seq[String],
                rows: Seq[Seq[String]]): Array[Byte] = {
    val sheetXml = {
      val sb = new StringBuilder
      sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
      (header +: rows).foreach { r =>
        sb ++= "<row>"
        r.foreach { v =>
          sb ++= s"""<c t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
        }
        sb ++= "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      sb.toString
    }
    val workbookXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"""" +
        """ xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        s"""<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val relsXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"""" +
        """ Target="worksheets/sheet1.xml"/></Relationships>"""

    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    put("xl/workbook.xml", workbookXml)
    put("xl/_rels/workbook.xml.rels", relsXml)
    put("xl/worksheets/sheet1.xml", sheetXml)
    zos.close()
    bos.toByteArray
  }

  /** Write workbook bytes to a temp file (the JDK zip reader wants a
    * path) and return it; the file is deleted on JVM exit.
    */
  def tempXlsx(sheetName: String, header: Seq[String],
               rows: Seq[Seq[String]]): String = {
    val p: Path = Files.createTempFile("graft-synth", ".xlsx")
    p.toFile.deleteOnExit()
    Files.write(p, xlsxBytes(sheetName, header, rows))
    p.toString
  }

  /** A temp directory populated with string files (relative path ->
    * content); deleted on JVM exit. Fixture scaffolding for the overlay
    * resolver / XInclude oracle query.
    */
  def tempDir(files: Seq[(String, String)]): String = {
    val d: Path = Files.createTempDirectory("graft-synth")
    d.toFile.deleteOnExit()
    files.foreach { case (rel, content) =>
      val p = d.resolve(rel)
      Files.createDirectories(p.getParent)
      p.toFile.deleteOnExit()
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    }
    d.toString
  }

  /** One XML document: <root><rowTag attr…><field>text</field>…</rowTag>…</root>
    * — each row becomes an element with `attrs` as attributes and
    * `fields` as child elements, ready for badgerfish conversion.
    */
  def xmlDoc(root: String, rowTag: String,
             rows: Seq[(Seq[(String, String)], Seq[(String, String)])]): String = {
    val sb = new StringBuilder
    sb ++= s"<$root>"
    rows.foreach { case (attrs, fields) =>
      val a = attrs.map { case (k, v) => s"""$k="${xmlEscape(v)}"""" }.mkString(" ")
      sb ++= (if (a.isEmpty) s"<$rowTag>" else s"<$rowTag $a>")
      fields.foreach { case (k, v) => sb ++= s"<$k>${xmlEscape(v)}</$k>" }
      sb ++= s"</$rowTag>"
    }
    sb ++= s"</$root>"
    sb.toString
  }
}
