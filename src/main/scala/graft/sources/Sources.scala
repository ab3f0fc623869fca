package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.ops.Badgerfish

/** The "E" of the pipeline — thin source wrappers (SURVEY §2.1).
  *
  * The reference reads XLSX workbooks, JSON and (aspirationally) XML
  * files one whole document at a time (src/main/index.js:143-159,
  * src/main/FileResolver.js:80-94); the Spark equivalents are columnar
  * scans, with badgerfish conversion available at ingest so downstream
  * operators see `@`-attribute schemas.
  */
object Sources {

  /** S1-shape: tabular rows → DataFrame. One DataFrame per "sheet"
    * (= file/dir).
    */
  def readParquet(s: SparkSession, path: String, badgerfish: Boolean = false): DataFrame =
    post(s.read.parquet(path), badgerfish)

  def readCsv(s: SparkSession, path: String, header: Boolean = true,
              badgerfish: Boolean = false): DataFrame =
    post(s.read.option("header", header.toString).option("inferSchema", "true").csv(path),
      badgerfish)

  /** S2: JSON file source (`FileResolver.read` + JSON.parse). With an
    * explicit schema the scan prunes + pushes down; without, one
    * inference pass.
    */
  def readJson(s: SparkSession, path: String, schema: Option[StructType] = None,
               badgerfish: Boolean = false): DataFrame = {
    val r = schema.fold(s.read)(sc => s.read.schema(sc))
    post(r.json(path), badgerfish)
  }

  /** Dynamic-schema ingestion of an embedded JSON string column
    * (`events.props`): `from_json` with a declared StructType.
    */
  def parseJsonColumn(df: DataFrame, column: String, schema: StructType): DataFrame =
    df.withColumn(column, from_json(col(column), schema))

  private def post(df: DataFrame, badgerfish: Boolean): DataFrame =
    if (badgerfish) Badgerfish.convert(df, toBfish = true) else df

  /** S7 executed over a real JDBC connection: whole-table read. Single
    * round-trip, one partition — the right shape for DIMENSION tables
    * (the reference's view sources are exactly that, src/main/etl.js:
    * 359-418). For fact-sized tables use [[readJdbcPartitioned]].
    */
  def readJdbc(s: SparkSession, url: String, table: String,
               props: java.util.Properties = new java.util.Properties()): DataFrame =
    s.read.jdbc(url, table, props)

  /** Partitioned JDBC scan: N concurrent range-predicated queries on
    * `partCol` — the only way a database read parallelizes across a
    * cluster. Stride skew follows the key distribution; pick a roughly
    * uniform numeric key (surrogate id, epoch day).
    */
  def readJdbcPartitioned(s: SparkSession, url: String, table: String,
                          partCol: String, lower: Long, upper: Long, numParts: Int,
                          props: java.util.Properties = new java.util.Properties()): DataFrame =
    s.read.jdbc(url, table, partCol, lower, upper, numParts, props)

  /** S6: overlay resolver — the reference's `FileResolver` walks
    * longest-matching prefix overlays and falls back outward
    * (src/main/FileResolver.js:25-78). Driver-side utility: overlay
    * roots in priority order; `resolve` returns the first root holding
    * the relative path.
    */
  final class FileResolver(overlays: Seq[String]) {
    def resolve(rel: String): Option[String] =
      overlays.iterator
        .map(root => new java.io.File(root, rel))
        .collectFirst { case f if f.exists() => f.getPath }

    def read(rel: String): String = {
      val p = resolve(rel).getOrElse(
        throw new java.io.FileNotFoundException(s"no overlay holds $rel"))
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    }

    /** S4: XInclude-style composition — recursively replace
      * `<xi:include href="…"/>` directives with the resolved file's
      * contents (reference: src/main/index.js:44-70). Driver-side string
      * composition, not a distributed op.
      */
    def readWithIncludes(rel: String, maxDepth: Int = 16): String = {
      require(maxDepth > 0, s"xinclude depth exhausted at $rel (cycle?)")
      val inc = """<xi:include\s+href="([^"]+)"\s*/>""".r
      inc.replaceAllIn(read(rel), m =>
        scala.util.matching.Regex.quoteReplacement(
          readWithIncludes(m.group(1), maxDepth - 1)))
    }
  }
}
