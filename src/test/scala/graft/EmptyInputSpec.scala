package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Empty-shard robustness: every registered query must EXECUTE (not
  * necessarily return rows) against structurally-identical but empty
  * tables. At 100 TB empty partitions and empty daily shards are
  * routine; an operator that throws on zero rows (descending sequence,
  * empty-collect require, max on nothing) would kill whole jobs in
  * production. The fixture is written by Spark itself so the events
  * table keeps whatever ts physical type the source generation carries
  * (GateSupport.events dispatches on it either way).
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Queries whose FIXTURE SYNTHESIS derives a document from table
    * contents: with zero rows the synthesized XML has no record array
    * to explode, so schema inference has nothing to resolve. That is
    * the synthesis path (a driver-side test harness), not the operator
    * — XmlSource's badgerfish conversion of an empty document is
    * covered in XlsxXmlSpec.
    */
  private val fixtureSynthesis = Set("source_xml", "source_overlay_xinclude")

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory(Paths.get("target"), "sf_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // needed to READ the nanos-timestamp events source here; harmless
    // globally — SparkEntry.events() sets the same flag on every call
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def deleteRecursively(p: java.io.File): Unit = {
    Option(p.listFiles).foreach(_.foreach(deleteRecursively))
    p.delete(); ()
  }

  test("every registered query executes on empty tables") {
    val failures =
      try SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (n, _) => fixtureSynthesis(n) }
        .flatMap { case (name, fn) =>
          try { fn(spark, emptyDir).count(); None }
          catch { case e: Throwable =>
            Some(s"$name -> ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
          }
        }
      finally deleteRecursively(new java.io.File(emptyDir))
    assert(failures.isEmpty, s"queries failing on empty input:\n${failures.mkString("\n")}")
  }
}
