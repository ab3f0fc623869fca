package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Extract, ViewDsl}

/** A2/A3: the family-tree relational fixture — entity/person/belonging
  * models, gender-encoding self-edges, the mother/father self-join
  * enrichment (J6) and the person view query (reference:
  * src/test/examples/models and views, person.js:19-43,
  * etl.spec.js:82-98).
  */
class ExtractViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val people = Seq(
    ("Sarah", null, "Terah"), ("Abraham", null, "Terah"),
    ("Nahor", null, "Terah"), ("Haran", null, "Terah"),
    ("Milcah", null, "Haran"), ("Bethuel", "Milcah", "Nahor"),
    ("Isaac", "Sarah", "Abraham"), ("Rebecca", null, "Bethuel"),
    ("Esau", "Rebecca", "Isaac"), ("Jacob", "Rebecca", "Isaac"))
  private val males = Set("Terah", "Abraham", "Nahor", "Haran", "Bethuel",
    "Isaac", "Esau", "Jacob")

  private def familyDf = people.toDF("name", "mother", "father")
  private def personDf = (people.map(_._1) :+ "Terah").distinct
    .map(n => (n, n)).toDF("ID", "name")
  // self-edge (minorID == majorID, rank 0) encodes male (person.js:32-43)
  private def belongingDf = (people.map(_._1) :+ "Terah").distinct
    .filter(males.contains)
    .map(n => (n, n, 0)).toDF("minorID", "majorID", "rank")

  test("mother/father double self-join enrichment with gender validation") {
    val edges = belongingDf.filter(col("rank") === 0)
    val spec = Seq(
      "mother_major" -> (Extract.Lookup(edges, "mother", "minorID",
        Seq("majorID" -> "mother_major")): Extract.Extractor),
      "father_major" -> Extract.Lookup(edges, "father", "minorID",
        Seq("majorID" -> "father_major")),
      // motherIsFemale: no rank-0 self-edge for the mother (null-tolerant)
      "motherIsFemale" -> Extract.ExprField(Seq("mother_major"),
        _ => col("mother").isNull || !(col("mother_major") <=> col("mother"))),
      "fatherIsMale" -> Extract.ExprField(Seq("father_major"),
        _ => col("father").isNull || (col("father_major") <=> col("father"))))
    val out = Extract.extract(familyDf, spec)
    val rows = out.collect().map(r => (r.getAs[String]("name"),
      r.getAs[Boolean]("motherIsFemale"), r.getAs[Boolean]("fatherIsMale")))
    assert(rows.length == 10)
    assert(rows.forall { case (_, mf, fm) => mf && fm })
  }

  test("person view: where + unique + required chain (A3)") {
    import ViewDsl._
    val reg = new Registry(Map(
      "Person" -> personDf, "Entity" -> personDf.select(col("ID"), lit("person").as("type")),
      "Belonging" -> belongingDf))
    val tree = ViewNode("Person", where = Seq("name" -> "Isaac"), unique = true,
      children = Seq(ViewNode("Entity", required = true, broadcast = true,
        where = Seq("type" -> "person"),
        assoc = Some(Assoc("ID", "ID", BelongsTo)),
        children = Seq(ViewNode("Belonging", where = Seq("rank" -> 0),
          assoc = Some(Assoc("ID", "minorID", BelongsTo)))))))
    val out = reg.applyView(tree)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("name") == "Isaac")
    assert(rows.head.getAs[String]("majorID") == "Isaac") // male self-edge
  }

  test("view over empty DB yields no rows (the {Person: null} case)") {
    import ViewDsl._
    val reg = new Registry(Map("Person" -> personDf.filter(lit(false))))
    val out = reg.applyView(ViewNode("Person", where = Seq("name" -> "Isaac")))
    assert(out.count() == 0)
  }

  test("lookup selecting the join key itself does not break the join") {
    val lk = personDf
    val out = Extract.extract(familyDf, Seq(
      "self_id" -> Extract.Lookup(lk, "name", "ID", Seq("ID" -> "self_id"))))
    assert(out.filter(col("self_id") === col("name")).count() == 10)
  }

  test("extract dependency cycle errors") {
    intercept[IllegalArgumentException](Extract.toposort(Seq(
      "a" -> Extract.ExprField(Seq("b"), _ => lit(1)),
      "b" -> Extract.ExprField(Seq("a"), _ => lit(2)))))
  }
}
