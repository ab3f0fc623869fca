package graft.sources

import scala.xml.{Elem, Node, Text, XML}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3/S4: XML ingestion via the badgerfish convention — what the
  * reference's dead `xml2json` branch intended
  * (src/main/FileResolver.js:87-91): attributes become `@`-keys, repeated
  * child elements become arrays, element text becomes `$`.
  *
  * Driver-side document parse (XML configs/messages are small control
  * inputs); the badgerfish JSON then enters Spark through the ordinary
  * JSON reader so the result is a struct-typed DataFrame that the T4/T5
  * badgerfish operators understand. Composes with
  * [[Sources.FileResolver.readWithIncludes]] for XInclude resolution.
  */
object XmlSource {

  /** One XML document string -> badgerfish JSON string. */
  def toBadgerfishJson(xml: String): String = {
    val root = XML.loadString(xml)
    s"{${q(root.label)}: ${obj(root)}}"
  }

  /** Parse resolved XML into a one-row DataFrame whose single column is
    * the root element's badgerfish struct.
    */
  def readXml(spark: SparkSession, resolver: Sources.FileResolver,
              rel: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(toBadgerfishJson(resolver.readWithIncludes(rel))).toDS())
  }

  // --------------------------------------------------------------- internals

  private def obj(e: Elem): String = {
    val attrs = e.attributes.asAttrMap.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q("@" + k)}: ${q(v)}" }
    val children = e.child.collect { case c: Elem => c }
    val grouped = children.groupBy(_.label)
    // preserve first-appearance order of child labels
    val childFields = children.map(_.label).distinct.map { label =>
      val group = grouped(label)
      val vs = group.map(obj)
      if (group.size == 1) s"${q(label)}: ${vs.head}"
      else s"${q(label)}: [${vs.mkString(", ")}]"
    }
    val text = e.child.collect { case t: Text => t.data }.mkString.trim
    val textField = if (text.nonEmpty && children.isEmpty) Seq(s"${q("$")}: ${q(text)}") else Nil
    (attrs ++ childFields ++ textField).mkString("{", ", ", "}")
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
