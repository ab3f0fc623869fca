package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Xslt

/** S5: XSLT pipeline semantics (reference: src/main/index.js:87-126) —
  * chain ordering, empty-chain identity, null/error behavior, and the
  * distributed column path.
  */
class XsltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val lower =
    """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      |<xsl:output method="xml" omit-xml-declaration="yes"/>
      |<xsl:template match="/n">
      |  <rec><id><xsl:value-of select="@k"/></id>
      |  <nm><xsl:value-of select="translate(nm,'ABCDEFGHIJKLMNOPQRSTUVWXYZ','abcdefghijklmnopqrstuvwxyz')"/></nm></rec>
      |</xsl:template>
      |</xsl:stylesheet>""".stripMargin

  private val toText =
    """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      |<xsl:output method="text"/>
      |<xsl:template match="/rec"><xsl:value-of select="concat(nm,'|',id)"/></xsl:template>
      |</xsl:stylesheet>""".stripMargin

  test("empty chain is the identity (index.js:89-91)") {
    assert(Xslt.applyChain("<n k=\"1\"><nm>AB</nm></n>", Nil) == "<n k=\"1\"><nm>AB</nm></n>")
  }

  test("chain applies in order: stage 2 sees stage 1's output") {
    assert(Xslt.applyChain("<n k=\"7\"><nm>GERMANY</nm></n>", Seq(lower, toText)) == "germany|7")
    // reversed chain: toText emits plain text, which the next stage
    // cannot parse as XML — order matters, and the failure is loud
    intercept[Exception] {
      Xslt.applyChain("<n k=\"7\"><nm>GERMANY</nm></n>", Seq(toText, lower))
    }
  }

  test("malformed XML fails loudly, not silently") {
    intercept[Exception] { Xslt.applyChain("<unclosed", Seq(toText)) }
  }

  test("malformed stylesheet fails at compile, not per row") {
    intercept[Exception] { Xslt.applyChain("<n/>", Seq("<xsl:not-a-stylesheet")) }
  }

  test("pipeline: distributed column transform, null passthrough") {
    val df = Seq((1L, Some("<n k=\"1\"><nm>FRANCE</nm></n>")),
      (2L, Some("<n k=\"2\"><nm>PERU</nm></n>")),
      (3L, None)).toDF("id", "x")
    val out = Xslt.pipeline(df, "x", Seq(lower, toText), outCol = "t")
      .orderBy("id").collect()
    // contract: every input column preserved, outCol appended
    assert(out.head.schema.fieldNames.toSeq == Seq("id", "x", "t"))
    assert(out.map(r => (r.getLong(0), Option(r.getAs[String]("t")))).toSeq ==
      Seq((1L, Some("france|1")), (2L, Some("peru|2")), (3L, None)))
  }

  test("pipeline: NULL id rides through instead of killing the job") {
    val df = Seq((Option.empty[Long], "<n k=\"9\"><nm>KENYA</nm></n>"))
      .toDF("id", "x")
    val out = Xslt.pipeline(df, "x", Seq(lower, toText), outCol = "t").collect()
    assert(out.length == 1 && out.head.isNullAt(0) &&
      out.head.getAs[String]("t") == "kenya|9")
  }

  test("pipeline: colliding output column name is rejected up front") {
    val df = Seq((1L, "<n/>")).toDF("id", "x")
    intercept[IllegalArgumentException] { Xslt.pipeline(df, "x", Nil, outCol = "x") }
  }

  test("pipeline plan is a narrow map — no exchange") {
    val df = Seq((1L, "<n k=\"1\"><nm>A</nm></n>")).toDF("id", "x")
    val plan = Xslt.pipeline(df, "x", Seq(lower)).queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("external document() access is blocked (secure processing)") {
    val evil =
      """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |<xsl:output method="text"/>
        |<xsl:template match="/"><xsl:value-of select="document('file:///etc/hostname')"/></xsl:template>
        |</xsl:stylesheet>""".stripMargin
    intercept[Exception] { Xslt.applyChain("<n/>", Seq(evil)) }
  }
}
