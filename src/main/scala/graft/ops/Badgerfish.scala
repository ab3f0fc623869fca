package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Badgerfish JSON convention operators.
  *
  * The reference's `convertJSONtoJSON` (src/main/etl.js:503-528) recursively
  * adds/strips the `@` attribute prefix on non-object leaf keys;
  * `attributes()` (src/main/etl.js:493-501) projects the `@`-keys stripping
  * the prefix; metadata keys start with `_` (src/main/etl.js:548-550).
  *
  * In Spark this is a pure SCHEMA transformation — zero runtime cost: we
  * rewrite `StructType` field names recursively and emit one `select` that
  * rebuilds nested structs with aliased fields. Catalyst collapses the
  * rebuild into the scan projection, so at 100 TB this costs exactly one
  * column-pruned pass (usually fused into whatever op follows).
  */
object Badgerfish {

  private def isMeta(name: String)  = name.startsWith("_")
  private def isAttr(name: String)  = name.startsWith("@")

  /** Recursively rename leaf fields: toBfish=true adds `@` to non-object,
    * non-meta leaf keys; toBfish=false strips it. Object-valued keys keep
    * their names (the reference only prefixes scalar/array leaves).
    */
  private def rename(name: String, dt: DataType, toBfish: Boolean): String = dt match {
    case _: StructType => name // object keys unprefixed, etl.js:512-517
    case _ if isMeta(name) => name
    case _ =>
      if (toBfish) { if (isAttr(name)) name else "@" + name }
      else         { if (isAttr(name)) name.substring(1) else name }
  }

  private def rebuild(c: Column, dt: DataType, toBfish: Boolean): Column = dt match {
    case st: StructType =>
      struct(st.fields.toSeq.map { f =>
        rebuild(c.getField(f.name), f.dataType, toBfish).as(rename(f.name, f.dataType, toBfish))
      }: _*)
    case ArrayType(et, _) => transform(c, x => rebuild(x, et, toBfish))
    case _ => c
  }

  /** convert(df, toBfish) — the T4 operator. */
  def convert(df: DataFrame, toBfish: Boolean): DataFrame =
    df.select(df.schema.fields.toSeq.map { f =>
      rebuild(col(f.name), f.dataType, toBfish).as(rename(f.name, f.dataType, toBfish))
    }: _*)

  /** attributes(df) — select `@`-prefixed columns, stripping the prefix
    * (T5, src/main/etl.js:493-501).
    */
  def attributes(df: DataFrame): DataFrame = {
    val attrs = df.columns.filter(isAttr)
    require(attrs.nonEmpty, "attributes(): no @-prefixed columns")
    df.select(attrs.toSeq.map(c => col(s"`$c`").as(c.substring(1))): _*)
  }

  /** values(df) — depth-first flatten of ALL scalar leaves, recursing into
    * arrays, omitting only the exact key `_` (T6: the reference's
    * `cpx.values` recurses through arrays and `_.omit(entity, '_')` drops
    * only that one key, src/main/index.js:178-195). Output: one row per
    * input row per leaf element, columns (path, value-as-string).
    */
  def values(df: DataFrame): DataFrame = {
    val emptyKv = array().cast("array<struct<path:string,value:string>>")
    // array<struct<path,value>> of every scalar leaf under (c, dt)
    def kvs(prefix: String, c: Column, dt: DataType): Column = dt match {
      case st: StructType =>
        val parts = st.fields.toSeq.filterNot(_.name == "_").map { f =>
          val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
          kvs(p, c.getField(f.name), f.dataType)
        }
        if (parts.isEmpty) emptyKv else concat(parts.map(p => coalesce(p, emptyKv)): _*)
      case ArrayType(et, _) =>
        coalesce(flatten(transform(c, x => kvs(prefix, x, et))), emptyKv)
      case _ =>
        array(struct(lit(prefix).as("path"), c.cast(StringType).as("value")))
    }
    val top = df.schema.fields.toSeq.filterNot(_.name == "_").map { f =>
      coalesce(kvs(f.name, col(f.name), f.dataType), emptyKv)
    }
    df.select(explode(concat(top: _*)).as("kv"))
      .select(col("kv.path").as("path"), col("kv.value").as("value"))
  }
}
