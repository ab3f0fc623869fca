package graft.sources

import java.io.{StringReader, StringWriter}
import java.util.concurrent.ConcurrentHashMap
import javax.xml.XMLConstants
import javax.xml.transform.{Templates, TransformerFactory}
import javax.xml.transform.stream.{StreamResult, StreamSource}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S5: the XSLT pipeline (reference: src/main/index.js:87-126).
  *
  * The reference chains libxslt stylesheets over one XML document at a
  * time — `xslPipeline(input, [xsl1, xsl2, …])` applies each stylesheet
  * to the previous stage's output string, and an EMPTY chain returns the
  * input verbatim (index.js:89-91). `xslTransform` (index.js:107-126)
  * derives the chain from an `xi:include` array: first element = input
  * document, rest = stylesheets, with XIncludes resolved first — compose
  * with [[Sources.FileResolver.readWithIncludes]] for that shape.
  *
  * Spark-first restatement: the stylesheet CHAIN is tiny driver-side
  * config (strings, captured in the closure); the DOCUMENT SET is the
  * distributed axis. Each partition transforms its rows independently —
  * a narrow map, no shuffle, parallelism = input partitions — so the
  * operator scales with the corpus exactly like any other per-document
  * string function. The JDK's built-in XSLT 1.0 processor
  * (`javax.xml.transform`, XSLTC) replaces libxslt: zero extra
  * dependencies, and compiled [[Templates]] are thread-safe, so each
  * executor JVM compiles every distinct stylesheet ONCE
  * (process-wide cache) and row-level work is transform-only.
  *
  * Untrusted-input hardening: secure processing is on and external
  * DTD/stylesheet fetches are disabled — a hostile document cannot make
  * executors dial out or read local files via `document()`/external
  * entities.
  */
object Xslt {

  /** Per-JVM compiled-stylesheet cache, keyed by stylesheet source. On a
    * cluster each executor compiles each distinct stylesheet once; tasks
    * share the thread-safe [[Templates]].
    */
  private val cache = new ConcurrentHashMap[String, Templates]()

  private def newFactory(): TransformerFactory = {
    val tf = TransformerFactory.newInstance()
    tf.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
    tf.setAttribute(XMLConstants.ACCESS_EXTERNAL_DTD, "")
    tf.setAttribute(XMLConstants.ACCESS_EXTERNAL_STYLESHEET, "")
    tf
  }

  private def templatesFor(stylesheet: String): Templates =
    cache.computeIfAbsent(stylesheet, s =>
      newFactory().newTemplates(new StreamSource(new StringReader(s))))

  /** Apply the stylesheet chain to one XML string — the reference's
    * `xslPipeline` (index.js:87-105): stage n's output is stage n+1's
    * input; the empty chain is the identity. A [[Templates]] is
    * thread-safe but a `Transformer` is not, so each call gets a fresh
    * (cheap) transformer from the cached compile.
    */
  def applyChain(xml: String, stylesheets: Seq[String]): String =
    stylesheets.foldLeft(xml) { (cur, sheet) =>
      val out = new StringWriter()
      templatesFor(sheet).newTransformer()
        .transform(new StreamSource(new StringReader(cur)), new StreamResult(out))
      out.toString
    }

  /** Distributed S5: transform an XML column through the stylesheet
    * chain. Contract matches the sibling per-document operators
    * (stripHtml, scriptProfile): every input column is PRESERVED and
    * the transformed document is APPENDED as `outCol` — no re-join on
    * an id, so duplicate or null keys cannot make the result lossy.
    * Narrow per-partition Row map — no shuffle, no driver round-trip;
    * the chain travels in the task closure and compiles once per
    * executor. NULL documents pass through as NULL (matching every
    * other string function in the engine); malformed XML fails the
    * task — the reference propagates parse errors too (index.js:92-95),
    * and silently nulling them would hide corruption.
    */
  def pipeline(df: DataFrame, xmlCol: String,
               stylesheets: Seq[String], outCol: String = "xml"): DataFrame = {
    // case-INsensitive guards: Spark's default resolution is
    // case-insensitive, so a case-variant collision would make
    // withColumn REPLACE instead of append and misalign the positional
    // row surgery below
    val lower = df.columns.map(_.toLowerCase).toSet
    require(!lower.contains(outCol.toLowerCase),
      s"output column '$outCol' already exists in ${df.columns.mkString("[", ",", "]")}")
    require(!lower.contains("_xslt_in"),
      "column name '_xslt_in' is reserved by Xslt.pipeline")
    val chain = stylesheets.toList
    // a temp string-cast column rides last so the mapper never guesses
    // the source type; it is dropped from the emitted row
    val src = df.withColumn("_xslt_in", col(xmlCol).cast("string"))
    val idx = src.schema.length - 1
    val outSchema = StructType(
      df.schema.fields :+ StructField(outCol, StringType, nullable = true))
    src.mapPartitions { it =>
      it.map { r =>
        val xml = if (r.isNullAt(idx)) null else r.getString(idx)
        val out = if (xml == null) null else applyChain(xml, chain)
        Row.fromSeq(r.toSeq.dropRight(1) :+ out)
      }
    }(Encoders.row(outSchema))
  }
}
