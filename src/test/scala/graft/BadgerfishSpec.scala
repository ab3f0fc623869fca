package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Badgerfish

/** A1: badgerfish round-trip over the family-tree batch (reference
  * round-trip test: src/test/specs/etl.spec.js:66-80).
  */
class BadgerfishSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The canonical 10-record Genesis batch (etl.spec.js:7-41). */
  def family = Seq(
    ("Sarah", null, "Terah"), ("Abraham", null, "Terah"),
    ("Nahor", null, "Terah"), ("Haran", null, "Terah"),
    ("Milcah", null, "Haran"), ("Bethuel", "Milcah", "Nahor"),
    ("Isaac", "Sarah", "Abraham"), ("Rebecca", null, "Bethuel"),
    ("Esau", "Rebecca", "Isaac"), ("Jacob", "Rebecca", "Isaac"))
    .toDF("name", "mother", "father")

  test("convert toBfish prefixes scalar leaves, keeps meta keys") {
    val bf = Badgerfish.convert(family.withColumn("_", lit("familyTree")), toBfish = true)
    assert(bf.columns.toSeq == Seq("@name", "@mother", "@father", "_"))
  }

  test("round-trip is the identity") {
    val rt = Badgerfish.convert(Badgerfish.convert(family, toBfish = true), toBfish = false)
    assert(rt.columns.toSeq == family.columns.toSeq)
    assert(rt.collect().toSeq == family.collect().toSeq)
  }

  test("attributes projects @-columns stripping the prefix") {
    val bf = Badgerfish.convert(family.withColumn("_", lit("m")), toBfish = true)
    val at = Badgerfish.attributes(bf)
    assert(at.columns.toSeq == Seq("name", "mother", "father"))
    assert(at.count() == 10)
  }

  test("values collects scalar leaves, recurses arrays, omits only '_'") {
    val df = Seq((7, Seq(1, 2), "x")).toDF("a", "arr", "_")
      .withColumn("s", struct(lit(5).as("inner"), lit("m").as("_")))
    val vs = Badgerfish.values(df).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(vs == Set(("a", "7"), ("arr", "1"), ("arr", "2"), ("s.inner", "5")))
  }

  test("values survives null arrays and null leaves") {
    val df = Seq((1, Some(Seq(3))), (2, None)).toDF("a", "arr")
    val vs = Badgerfish.values(df).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(vs == Set(("a", "1"), ("arr", "3"), ("a", "2")))
  }
}
