package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{EtlLeaf, EtlObj, EtlSchema}
import graft.ops._
import graft.sources.{Sources, XmlSource}

/** Capstone: the reference's whole usage surface in ONE flow — an XML
  * family document through xinclude resolution, badgerfish conversion,
  * attribute projection, schema coercion (null sentinels), pipeline
  * dispatch + validation + self-join extraction, relational load split,
  * and the fixed-width sink. A user of the reference runs exactly this
  * sequence (convert → applySchema → register → extract → load); this
  * test proves the Spark engine runs it end-to-end.
  */
class EndToEndSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("family XML -> badgerfish -> schema -> pipeline -> load -> fixed-width") {
    // 1. XML source with an xinclude (S3 + S4)
    val d = Files.createTempDirectory(Paths.get("target"), "e2e")
    Files.writeString(d.resolve("family.xml"),
      """<family name="terah"><xi:include href="people.xml"/></family>""")
    Files.writeString(d.resolve("people.xml"),
      """<people>
        |  <person ID="1" kind="person" name="Terah" father=""/>
        |  <person ID="2" kind="person" name="Abraham" father="1"/>
        |  <person ID="3" kind="person" name="Isaac" father="2"/>
        |  <person ID="4" kind="thing" name="Ark" father=""/>
        |</people>""".stripMargin)
    val doc = XmlSource.readXml(spark, new Sources.FileResolver(Seq(d.toString)), "family.xml")

    // 2. explode the repeated element, project @-attributes (T4/T5)
    val persons = Badgerfish.attributes(
      doc.select(explode(col("family.people.person")).as("p")).select(col("p.*")))
    assert(persons.columns.sorted.toSeq == Seq("ID", "father", "kind", "name"))

    // 3. schema coercion: numbers parse, '' becomes null (C1/C3)
    val typed = EtlSchema.applySchema(persons, EtlObj(Seq(
      "ID" -> EtlLeaf("Number"), "kind" -> EtlLeaf("String"),
      "name" -> EtlLeaf("String"), "father" -> EtlLeaf("Number"))))
    assert(typed.schema("ID").dataType.typeName == "long")
    assert(typed.filter(col("father").isNull).count() == 2) // Terah + Ark

    // 4. pipeline: dispatch on kind, validate the name shape, extract the
    //    father's name via self-join lookup + a derived boolean (F4/F1/J6/U2)
    val m = Pipeline.PipelineMapping("person",
      matchSpec = Seq("kind" -> "person"),
      validation = Seq("name" -> Seq(Validate.Pred(x => x.rlike("^[A-Z][a-z]+$")))),
      extract = Seq(
        "father_name" -> Extract.Lookup(typed, "father", "ID",
          Seq("name" -> "father_name")),
        "hasFather" -> Extract.ExprField(Seq("father_name"),
          _ => col("father_name").isNotNull)))
    val out = Pipeline.run(typed,
      Seq(m, Pipeline.PipelineMapping("thing", Seq("kind" -> "thing"))), "person")
    val rows = out.select("ID", "name", "father_name", "hasFather", "_valid").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)),
        r.getBoolean(3), r.getBoolean(4))).sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, "Terah", None, false, true),
      (2L, "Abraham", Some("Terah"), true, true),
      (3L, "Isaac", Some("Abraham"), true, true)))

    // 5. load: split + ordered write into an in-memory sink (S8 shape)
    val written = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    Load.loadOrdered("person" -> out, Nil,
      (name, df) => written(name) = df.count())
    assert(written.toSeq == Seq("person" -> 3L))

    // 6. fixed-width sink golden line (S9/C5-C8)
    val sinkDir = d.resolve("fw").toString
    Load.writeFixedWidth(
      out.filter(col("ID") === 2).select(col("ID").cast("string").as("ID"),
        col("name"), col("hasFather").cast("string").as("hasFather")),
      EtlObj(Seq("ID" -> EtlLeaf("Number", Some(4)),
        "name" -> EtlLeaf("String", Some(8)),
        "hasFather" -> EtlLeaf("Boolean", Some(2)))), sinkDir)
    val line = spark.read.text(sinkDir).collect().map(_.getString(0))
    assert(line.toSeq == Seq("0002Abraham 01"))
  }
}
