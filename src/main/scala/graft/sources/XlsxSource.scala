package graft.sources

import java.util.zip.ZipFile
import scala.xml.{Node, XML}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.Row

/** S1: a real XLSX source — the reference's flagship input
  * (`cpx.convert(buffer, xlsx-mimetype)`, src/main/index.js:143-159:
  * every sheet becomes an array of row objects keyed by the header row;
  * empty sheets are dropped).
  *
  * XLSX is a zip of SpreadsheetML parts; this reader handles the parts
  * the capability needs — workbook sheet names, shared strings, inline
  * strings, numeric/boolean cells — with the JDK zip reader and
  * scala-xml. Parsing happens on the DRIVER (workbooks are small control
  * inputs, like the reference's in-memory buffers); the resulting rows
  * become an ordinary DataFrame, and big tabular data belongs in
  * parquet/CSV scans ([[Sources.readCsv]]).
  *
  * All cells surface as strings (XLSX stores display values; the schema
  * layer — [[graft.model.EtlSchema.applySchema]] — owns coercion, same
  * split as the reference's convert-then-applySchema flow).
  */
object XlsxSource {

  /** Read every non-empty sheet: name -> DataFrame (header row = column
    * names, remaining rows = string cells).
    */
  def readWorkbook(spark: SparkSession, path: String): Map[String, DataFrame] = {
    val zf = new ZipFile(path)
    try {
      val shared = sharedStrings(zf)
      val sheets = sheetEntries(zf)
      sheets.flatMap { case (name, entry) =>
        val rows = parseSheet(XML.load(zf.getInputStream(zf.getEntry(entry))), shared)
        if (rows.isEmpty || rows.head.isEmpty) None
        else {
          val header = rows.head
          val data = rows.tail.map(r =>
            Row.fromSeq(header.indices.map(i => r.lift(i).filter(_.nonEmpty).orNull)))
          val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
          Some(name -> spark.createDataFrame(
            spark.sparkContext.parallelize(data.toSeq), schema))
        }
      }.toMap
    } finally zf.close()
  }

  /** Single-sheet convenience (first sheet by workbook order). */
  def readSheet(spark: SparkSession, path: String, sheet: String): DataFrame =
    readWorkbook(spark, path).getOrElse(sheet,
      throw new IllegalArgumentException(s"no non-empty sheet named $sheet in $path"))

  // --------------------------------------------------------------- internals

  private def sharedStrings(zf: ZipFile): IndexedSeq[String] =
    Option(zf.getEntry("xl/sharedStrings.xml")).map { e =>
      (XML.load(zf.getInputStream(e)) \ "si").map(si => (si \\ "t").map(_.text).mkString)
        .toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** Sheet name -> worksheet part path, via workbook.xml + its rels. */
  private def sheetEntries(zf: ZipFile): Seq[(String, String)] = {
    val wb = XML.load(zf.getInputStream(zf.getEntry("xl/workbook.xml")))
    val rels = XML.load(zf.getInputStream(zf.getEntry("xl/_rels/workbook.xml.rels")))
    val relMap = (rels \ "Relationship").map(r =>
      (r \@ "Id") -> (r \@ "Target")).toMap
    (wb \ "sheets" \ "sheet").map { s =>
      val rid = s.attributes.asAttrMap.collectFirst {
        case (k, v) if k.endsWith("id") && v.startsWith("rId") => v
      }.getOrElse(s \@ "id")
      val target = relMap.getOrElse(rid, s"worksheets/sheet${s \@ "sheetId"}.xml")
      (s \@ "name") -> (if (target.startsWith("/")) target.drop(1) else s"xl/$target")
    }
  }

  /** Dense row matrix from sheetData (missing cells become ""). The `r`
    * cell reference is OPTIONAL in SpreadsheetML (streaming writers omit
    * it); a cell without one sits immediately after the previous cell,
    * so track a running column counter as the fallback.
    */
  private def parseSheet(sheet: Node, shared: IndexedSeq[String]): Seq[Seq[String]] =
    (sheet \ "sheetData" \ "row").map { row =>
      var nextCol = 0
      val cells = (row \ "c").map { c =>
        val letters = (c \@ "r").takeWhile(_.isLetter)
        val idx = if (letters.nonEmpty) colIndex(letters) else nextCol
        nextCol = idx + 1
        idx -> cellValue(c, shared)
      }
      if (cells.isEmpty) Seq.empty
      else {
        val width = cells.map(_._1).max + 1
        val arr = Array.fill(width)("")
        cells.foreach { case (i, v) => arr(i) = v }
        arr.toSeq
      }
    }

  private def cellValue(c: Node, shared: IndexedSeq[String]): String =
    (c \@ "t") match {
      case "s" => // shared-string index
        (c \ "v").text.toIntOption.flatMap(shared.lift).getOrElse("")
      case "inlineStr" => (c \ "is" \\ "t").map(_.text).mkString
      case "b" => if ((c \ "v").text.trim == "1") "true" else "false"
      case _ => (c \ "v").text // numeric / formula-cached / plain
    }

  /** "A"->0, "Z"->25, "AA"->26 … */
  private[graft] def colIndex(letters: String): Int =
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
}
