package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Pipeline, Transform, Validate}
import graft.sources.Sources

/** Pipeline composition, source wrappers, overlay/include resolver, F2
  * array validation and T3 numeric scatter targets.
  */
class PipelineSourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pipeline: match routes, defaults patch, validate annotates, transform reshapes") {
    val df = Seq(("familyTree", "Sarah", null: String),
      ("familyTree", "bad name", "x"), ("other", "Zed", null: String))
      .toDF("_", "name", "src")
    val m = Pipeline.PipelineMapping("family",
      matchSpec = Seq("_" -> "familyTree"),
      defaults = Seq("src" -> "unknown"),
      validation = Seq("name" -> Seq(Validate.isName)),
      transform = Some(Transform.TObj(Seq(
        "who" -> Transform.TPath("name"),
        "src" -> Transform.TPath("src"),
        "ok" -> Transform.TPath("_valid")))))
    val out = Pipeline.run(df, Seq(m), "family").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(out == Set(("Sarah", "unknown", true), ("bad name", "x", false)))
  }

  test("csv and json sources round-trip with badgerfish option") {
    val dir = Files.createTempDirectory(Paths.get("target"), "src").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.mode("overwrite")
      .option("header", "true").csv(s"$dir/csv")
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").json(s"$dir/json")
    val csv = Sources.readCsv(spark, s"$dir/csv")
    assert(csv.columns.toSeq == Seq("k", "v") && csv.count() == 2)
    val js = Sources.readJson(spark, s"$dir/json", badgerfish = true)
    assert(js.columns.sorted.toSeq == Seq("@k", "@v"))
  }

  test("parseJsonColumn ingests embedded JSON with a declared schema") {
    val df = Seq(("""{"k": 7}""")).toDF("props")
    val out = Sources.parseJsonColumn(df, "props",
      StructType(Seq(StructField("k", LongType))))
    assert(out.select("props.k").collect().head.getLong(0) == 7L)
  }

  test("overlay resolver prefers earlier roots and falls back") {
    val a = Files.createTempDirectory(Paths.get("target"), "ovA")
    val b = Files.createTempDirectory(Paths.get("target"), "ovB")
    Files.writeString(a.resolve("x.txt"), "from-a")
    Files.writeString(b.resolve("x.txt"), "from-b")
    Files.writeString(b.resolve("only-b.txt"), "only-b")
    val fr = new Sources.FileResolver(Seq(a.toString, b.toString))
    assert(fr.read("x.txt") == "from-a")
    assert(fr.read("only-b.txt") == "only-b")
    assert(fr.resolve("missing.txt").isEmpty)
  }

  test("xinclude composition inlines recursively") {
    val d = Files.createTempDirectory(Paths.get("target"), "xi")
    Files.writeString(d.resolve("root.xml"), """<a><xi:include href="mid.xml"/></a>""")
    Files.writeString(d.resolve("mid.xml"), """<b><xi:include href="leaf.xml"/></b>""")
    Files.writeString(d.resolve("leaf.xml"), "<c/>")
    val fr = new Sources.FileResolver(Seq(d.toString))
    assert(fr.readWithIncludes("root.xml") == "<a><b><c/></b></a>")
  }

  test("F2: array-element validation records failing indices") {
    val df = Seq((1L, Seq("alpha", "xy", "beta", "z"))).toDF("id", "toks")
    val out = Validate.validateElements(df, "toks",
      Seq(Validate.Pred(x => length(x) > 2))).collect().head
    assert(out.getAs[scala.collection.Seq[Boolean]]("toks_elem_valid").toSeq ==
      Seq(true, false, true, false))
    assert(out.getAs[scala.collection.Seq[Int]]("toks_invalid_idx").toSeq == Seq(1, 3))
    assert(!out.getAs[Boolean]("toks_valid"))
  }

  test("T3: numeric scatter segments build arrays by position, gaps null") {
    val df = Seq((10, 30)).toDF("a", "c")
    val out = Transform.scatter(df, Seq("a" -> Seq("xs.0"), "c" -> Seq("xs.2")))
    val xs = out.select(col("xs")).collect().head.getSeq[Any](0)
    assert(xs == Seq(10, null, 30))
  }
}
