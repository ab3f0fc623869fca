package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{PathExpr, Transform}
import graft.ops.Transform._

/** A5: path language + declarative transform over the canonical input
  * {a:{b:[{x:1},{x:2}]}, c:7} (reference: src/main/etl.js:35-75, 324-405).
  */
class PathTransformSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def input = Seq((7)).toDF("c")
    .withColumn("a", struct(array(
      struct(lit(1).as("x")), struct(lit(2).as("x"))).as("b")))
    .withColumn("e", struct(lit(9).as("x")))

  test("dotted path, literal, #name array length") {
    val out = Transform.applyTransform(input, TObj(Seq(
      "c" -> TPath("c"),
      "lit5" -> TLit(5),
      "blen" -> TPath("a.#b"))))
    val r = out.collect().head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == (7, 5, 2))
  }

  test("array-map injects $ root and # index per element") {
    val out = Transform.applyTransform(input, TObj(Seq(
      "mapped" -> TArrMap("a.b", TObj(Seq(
        "x" -> TPath("x"), "i" -> TPath("#"), "root_c" -> TPath("$.c")))))))
    val rows = out.select(explode(col("mapped")).as("m"))
      .select("m.x", "m.i", "m.root_c").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(rows == Set((1, 0, 7), (2, 1, 7)))
  }

  test("unique:true is scalar passthrough, not element_at") {
    val out = Transform.applyTransform(input, TObj(Seq(
      "ex" -> TArrMap("e", TObj(Seq("x" -> TPath("x"))), unique = true))))
    assert(out.select("ex.x").collect().head.getInt(0) == 9)
  }

  test("path error cases: '#name' / '#' must be terminal; '#' needs array scope") {
    val scope = PathExpr.rowScope(input.columns.toSeq)
    intercept[IllegalArgumentException](PathExpr.compile("a.#b.x", scope))
    intercept[IllegalArgumentException](PathExpr.compile("#.x", scope))
    intercept[IllegalArgumentException](PathExpr.compile("#", scope))
  }

  test("numeric path segments index arrays 0-based") {
    val scope = PathExpr.rowScope(input.columns.toSeq)
    val c = PathExpr.compile("a.b.1.x", scope)
    assert(input.select(c).collect().head.getInt(0) == 2)
  }

  test("scatter multi-target writes one source to several paths") {
    val df = Seq((1L, 2.5, "x")).toDF("k", "p", "s")
    val out = Transform.scatter(df, Seq(
      "k" -> Seq("ids.okey", "flat"), "p" -> Seq("ids.price"), "s" -> Seq("status")))
    val r = out.select(col("flat"), col("ids.okey"), col("ids.price"), col("status"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)) == (1L, 1L, 2.5, "x"))
  }

  test("defaults patch fills only nulls, adds missing columns") {
    val df = Seq((Option("a")), (None: Option[String])).toDF("v")
    val out = Transform.applyDefaults(df, Seq("v" -> "dflt", "extra" -> 1))
    assert(out.collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      Set(("a", 1), ("dflt", 1)))
  }
}
