package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ViewDsl
import graft.ops.ViewDsl._

/** J3 hasMany nesting, J5 many-to-many through, and C10 naming — the
  * view shapes without a dedicated spec until now.
  */
class ViewShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registry = new Registry(Map(
    "Author" -> Seq((1L, "anne"), (2L, "bram"), (3L, "carol"))
      .toDF("a_id", "a_name"),
    "Book" -> Seq((10L, 1L, "x"), (11L, 1L, "y"), (12L, 2L, "z"))
      .toDF("b_id", "b_author", "b_title"),
    "Tag" -> Seq((100L, 10L, "scifi"), (101L, 11L, "scifi"), (102L, 12L, "hist"))
      .toDF("t_id", "t_book", "t_name")))

  test("J3: hasMany nest collects children as array column named after the model") {
    val tree = ViewNode("Author",
      children = Seq(ViewNode("Book", nest = true,
        assoc = Some(Assoc("a_id", "b_author", HasMany)))))
    val out = registry.applyView(tree)
    assert(out.columns.contains("books")) // C10: lowered model name + s
    val byAuthor = out.collect().map(r => r.getAs[String]("a_name") ->
      Option(r.getAs[scala.collection.Seq[Row]]("books"))
        .map(_.map(_.getAs[String]("b_title")).sorted.toSeq)
    ).toMap
    assert(byAuthor("anne") == Some(Seq("x", "y")))
    assert(byAuthor("bram") == Some(Seq("z")))
    assert(byAuthor("carol").isEmpty || byAuthor("carol") == Some(Seq()))
  }

  test("maxNest caps children per parent and validates the ordering columns") {
    val capped = ViewNode("Author",
      children = Seq(ViewNode("Book", nest = true, maxNest = Some(1),
        assoc = Some(Assoc("a_id", "b_author", HasMany)))))
    val out = registry.applyView(capped).collect()
      .map(r => r.getAs[String]("a_name") ->
        Option(r.getAs[scala.collection.Seq[Row]]("books")).map(_.length).getOrElse(0))
      .toMap
    assert(out("anne") == 1 && out("bram") == 1)
    // a key-only child projection cannot order the cap — loud error, not
    // an opaque AnalysisException from an empty window ORDER BY
    val keyOnly = ViewNode("Author",
      children = Seq(ViewNode("Book", nest = true, maxNest = Some(1),
        columns = Seq("b_author"),
        assoc = Some(Assoc("a_id", "b_author", HasMany)))))
    val e = intercept[IllegalArgumentException](registry.applyView(keyOnly))
    assert(e.getMessage.contains("only the join key"))
  }

  test("J5: many-to-many through the junction model") {
    val out = registry.manyToMany("Author", "Book", "Tag",
      "a_id", "b_author", "b_id", "t_book")
    val pairs = out.select(col("a_name"), col("t_name")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("anne", "scifi"), ("bram", "hist")))
  }

  test("C10: lowerFirst lowers only the first letter") {
    assert(ViewDsl.lowerFirst("Book") == "book")
    assert(ViewDsl.lowerFirst("XMLDoc") == "xMLDoc")
    assert(ViewDsl.lowerFirst("") == "")
  }
}
