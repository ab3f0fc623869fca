package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextAnalysis
import graft.ops.{Badgerfish, Transform}

/** Property-based invariants over randomized inputs (ScalaCheck driving
  * whole-DataFrame checks; one Spark job per property batch).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("property: badgerfish round-trip is the identity for any column names") {
    val nameGen = Gen.identifier.suchThat(n => n.nonEmpty && !n.startsWith("@"))
    check(Prop.forAll(Gen.listOfN(3, nameGen).suchThat(_.distinct.size == 3)) { names =>
      val df = Seq((1, "x", 2.5)).toDF(names: _*)
      val rt = Badgerfish.convert(Badgerfish.convert(df, toBfish = true), toBfish = false)
      rt.columns.toSeq == df.columns.toSeq && rt.collect().toSeq == df.collect().toSeq
    })
  }

  test("property: native rolling hash equals HOF fold on arbitrary strings") {
    val strGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', ',', 'ü', 'ß', '汉')))
      .map(_.mkString)
    check(Prop.forAll(Gen.listOfN(20, strGen)) { strs =>
      val df = strs.toDF("s")
      df.select(TextAnalysis.rollingHash(col("s")).as("a"),
        TextAnalysis.rollingHashHof(col("s")).as("b"))
        .filter(col("a") =!= col("b")).count() == 0
    })
  }

  test("property: scatter to any target path then re-select returns the source") {
    val seg = Gen.identifier.suchThat(_.nonEmpty)
    val pathGen = Gen.listOfN(2, seg).map(_.mkString("."))
    check(Prop.forAll(pathGen, Gen.chooseNum(-1000L, 1000L)) { (path, v) =>
      val df = Seq((v)).toDF("src")
      val out = Transform.scatter(df, Seq("src" -> Seq(path)))
      out.select(col(path)).collect().head.getLong(0) == v
    })
  }

  test("property: r6 is idempotent and within half-ulp-of-1e-6 of the input") {
    check(Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { x =>
      val Seq(once, twice) = Seq(lit(x)).map(c =>
        (Num.r6(c), Num.r6(Num.r6(c)))).flatMap { case (a, b) => Seq(a, b) }
      val r = spark.range(1).select(once.as("a"), twice.as("b")).collect().head
      val a = r.getDouble(0); val b = r.getDouble(1)
      a == b && math.abs(a - x) <= 5.0000001e-7
    })
  }
}
