package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Validate
import graft.ops.Validate._

/** F1/F4/F5: clause validation, match dispatch, match-validate matrix
  * (reference: src/main/etl.js:77-102, 544-594; etl.spec.js:100-121).
  */
class ValidateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clause OR-list: literal, Absent (optional), predicate; annotates not drops") {
    val df = Seq(("Sarah", null), ("sarah", "x y"), ("Terah", "Haran"))
      .toDF("name", "father")
    val out = Validate.validate(df, Seq(
      "name" -> Seq(Validate.isName),
      "father" -> Seq(Absent, Validate.isName)))
    assert(out.count() == 3) // nothing dropped
    val byName = out.collect().map(r =>
      r.getAs[String]("name") -> (r.getAs[Boolean]("name_valid"),
        r.getAs[Boolean]("father_valid"), r.getAs[Boolean]("_valid"))).toMap
    assert(byName("Sarah") == ((true, true, true)))   // null father is optional
    assert(byName("sarah") == ((false, false, false)) )
    assert(byName("Terah") == ((true, true, true)))
  }

  test("match dispatch: first registered mapping wins; no match annotates null") {
    val df = Seq(("familyTree", 1), ("other", 2), ("familyTree", 3), ("nope", 4))
      .toDF("_", "v")
    val out = Validate.dispatch(df, Seq(
      Mapping("family", Seq("_" -> "familyTree")),
      Mapping("fallback", Seq("_" -> "other"))))
    val m = out.collect().map(r => r.getAs[Int]("v") -> r.getAs[String]("_mapping")).toMap
    assert(m == Map(1 -> "family", 2 -> "fallback", 3 -> "family", 4 -> null))
  }

  test("match-validate matrix emits per-key failed booleans") {
    val df = Seq(("BUILDING", 10.0), ("AUTO", -5.0)).toDF("seg", "bal")
    val out = Validate.matchValidate(df, Seq(
      "seg" -> Seq(EqLit("BUILDING")),
      "bal" -> Seq(Pred(_ > 0.0))), keep = Seq("seg"))
    val m = out.collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2))).toSet
    assert(m == Set(("BUILDING", false, false), ("AUTO", true, true)))
  }

  test("observe metric counts invalid rows") {
    val df = Seq(("Sarah"), ("bad name")).toDF("name")
    val out = Validate.observed(
      Validate.validate(df, Seq("name" -> Seq(Validate.isName))), "vmetric")
    out.collect()
    // observe registers; metric retrieval is covered by the listener API —
    // here we just assert the plan executes and annotates
    assert(out.columns.contains("_valid"))
  }
}
