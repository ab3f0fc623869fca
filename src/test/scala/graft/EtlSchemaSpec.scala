package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model._

/** A4: applySchema coercion table + fixed-width golden strings
  * (reference: src/main/etl.js:191-322).
  */
class EtlSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("number coercion parses; empty string nulls nullable leaves") {
    val df = Seq(("42", "7"), ("13", "")).toDF("a", "b")
    val out = EtlSchema.applySchema(df, EtlObj(Seq(
      "a" -> EtlLeaf("number"), "b" -> EtlLeaf("Number"))))
    assert(out.collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet ==
      Set((42L, Some(7L)), (13L, None)))
  }

  test("required number with non-numeric input raises instead of nulling") {
    // under Spark 4's default ANSI mode the cast itself raises
    // CAST_INVALID_INPUT; with ANSI off the explicit raise_error guard in
    // coerce fires ("number expected") — either way bad input NEVER
    // becomes a silent null in a nullable=false field
    val df = Seq(("x")).toDF("a")
    val out = EtlSchema.applySchema(df, EtlObj(Seq("a" -> EtlLeaf("number"))))
    val e = intercept[Exception](out.collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("number expected") || msgs.contains("CAST_INVALID_INPUT"))
  }

  test("boolean coercion: 'false' literal, truthy strings, '' to null") {
    val df = Seq(("false", "true"), ("true", "")).toDF("a", "b")
    val out = EtlSchema.applySchema(df, EtlObj(Seq(
      "a" -> EtlLeaf("boolean"), "b" -> EtlLeaf("Boolean"))))
    assert(out.collect().map(r => (r.getBoolean(0), Option(r.get(1)))).toSet ==
      Set((false, Some(true)), (true, None)))
  }

  test("date coercion: '0000-00-00' sentinel to null") {
    val df = Seq(("2020-01-02"), ("0000-00-00")).toDF("d")
    val out = EtlSchema.applySchema(df, EtlObj(Seq("d" -> EtlLeaf("Date"))))
    val vals = out.collect().map(r => Option(r.get(0)).map(_.toString)).toSet
    assert(vals == Set(Some("2020-01-02"), None))
  }

  test("fixed-width golden strings per A4") {
    val df = Seq((Option(42L), Option(true), Option("2020-01-02"), Option("abcdef")),
      (None: Option[Long], None: Option[Boolean], None: Option[String], Option("ab")))
      .toDF("n", "b", "d", "s")
    val out = EtlSchema.applyFixedWidth(df, EtlObj(Seq(
      "n" -> EtlLeaf("Number", Some(6)), "b" -> EtlLeaf("Boolean", Some(3)),
      "d" -> EtlLeaf("Date", Some(8)), "s" -> EtlLeaf("String", Some(4)))))
    val got = out.collect().map(_.getString(0)).toSet
    assert(got == Set(
      "000042" + "001" + "20200102" + "abcd",
      "      " + "   " + "00000000" + "ab  "))
  }

  test("false renders as zeros, null boolean as spaces (distinct)") {
    val df = Seq((Option(false)), (None: Option[Boolean])).toDF("b")
    val out = EtlSchema.applyFixedWidth(df, EtlObj(Seq("b" -> EtlLeaf("Boolean", Some(3)))))
    assert(out.collect().map(_.getString(0)).toSet == Set("000", "   "))
  }

  test("closed world: unknown and missing properties error") {
    val df = Seq((1, 2)).toDF("a", "zz")
    intercept[IllegalArgumentException](
      EtlSchema.applySchema(df, EtlObj(Seq("a" -> EtlLeaf("number")))))
    intercept[IllegalArgumentException](
      EtlSchema.applySchema(df, EtlObj(Seq(
        "a" -> EtlLeaf("number"), "zz" -> EtlLeaf("number"), "q" -> EtlLeaf("number")))))
  }

  test("closed world recurses into nested objects with dotted trails") {
    val df = Seq((1)).toDF("a")
      .withColumn("s", struct(lit(2).as("x"), lit(3).as("zz")))
    val e = intercept[IllegalArgumentException](
      EtlSchema.checkClosedWorld(df, EtlObj(Seq(
        "a" -> EtlLeaf("number"),
        "s" -> EtlObj(Seq("x" -> EtlLeaf("number")))))))
    assert(e.getMessage.contains("s.zz"))
  }

  test("unknown schema type errors eagerly") {
    intercept[IllegalArgumentException](
      EtlSchema.applySchema(Seq((1)).toDF("a"), EtlObj(Seq("a" -> EtlLeaf("blob")))))
  }
}
