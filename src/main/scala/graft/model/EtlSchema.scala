package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative message schema with type coercion and fixed-width rendering.
  *
  * Mirrors the reference's `applySchema` spec language
  * (reference: src/main/etl.js:191-322): a leaf is `(typeName, size?)`,
  * an array schema wraps an element schema, an object schema is a
  * closed-world key -> schema map (unknown/missing properties are errors,
  * src/main/etl.js:313-318). Capitalized leaf type names are nullable
  * ('' -> null, src/main/etl.js:210-216); lowercase are required.
  *
  * Spark-first design: a schema COMPILES to `Column` expression trees
  * (casts, `when`/`otherwise` null sentinels, `lpad`/`rpad` fixed-width
  * renders) — evaluated columnar under whole-stage codegen, never
  * row-at-a-time.
  */
sealed trait EtlSchema {
  /** Spark StructType equivalent (object schemas only have one). */
  def toDataType: DataType = this match {
    case EtlLeaf(t, _) =>
      EtlSchema.baseType(t)
    case EtlArr(e)  => ArrayType(e.toDataType, containsNull = true)
    case EtlObj(fs) => StructType(fs.map { case (k, v) =>
      StructField(k, v.toDataType, nullable = v.nullableLeaf)
    })
  }
  def nullableLeaf: Boolean = this match {
    case EtlLeaf(t, _) => t.headOption.exists(_.isUpper) || t == "*"
    case _             => true
  }
}
final case class EtlLeaf(tpe: String, size: Option[Int] = None) extends EtlSchema
final case class EtlArr(elem: EtlSchema) extends EtlSchema
final case class EtlObj(fields: Seq[(String, EtlSchema)]) extends EtlSchema

object EtlSchema {
  private[model] def baseType(t: String): DataType = t.toLowerCase match {
    case "boolean" => BooleanType
    case "number"  => LongType
    case "date"    => DateType
    case "string"  => StringType
    case "*"       => StringType
    case other     => throw new IllegalArgumentException(s"unknown schema type: $other")
  }

  /** Coerce a (possibly string-typed) column to the leaf's type, honouring
    * the reference's sentinels: '' -> null for nullable leaves
    * (src/main/etl.js:210,242,262), '0000-00-00' -> null for Date
    * (src/main/etl.js:262), 'false' -> false under boolean force
    * (src/main/etl.js:218-224).
    */
  def coerce(c: Column, leaf: EtlLeaf): Column = {
    val nulled =
      if (leaf.nullableLeaf) when(c.cast(StringType) === lit(""), lit(null)).otherwise(c)
      else c
    leaf.tpe.toLowerCase match {
      case "*"      => c
      case "number" =>
        val casted = nulled.cast(LongType)
        if (leaf.nullableLeaf) casted
        else
          // required leaf: a non-null input that fails the parse must NOT
          // silently become null (the reference throws 'number expected',
          // src/main/etl.js:253-255) — the StructField claims
          // nullable=false, so a silent null would dodge validation
          when(c.isNotNull && casted.isNull,
            raise_error(concat(lit("number expected: "), c.cast(StringType)))
              .cast(LongType))
            .otherwise(casted)
      case "boolean" =>
        when(nulled.cast(StringType) === lit("false"), lit(false))
          .otherwise(nulled.cast(BooleanType))
      case "date" =>
        to_date(when(nulled.cast(StringType) === lit("0000-00-00"), lit(null))
          .otherwise(nulled))
      case "string" => nulled.cast(StringType)
      case other =>
        throw new IllegalArgumentException(s"unknown schema type: $other")
    }
  }

  /** Render one coerced leaf to its fixed-width text field — the
    * mainframe-style flat-file mode (`force === 'TRUE'`,
    * src/main/etl.js:228-294): booleans -> '0'*n / '0'*(n-1)+'1';
    * numbers zero-padded left; dates YYYYMMDD; strings truncated +
    * space-padded right; nulls as spaces (strings/numbers) or zeros
    * (booleans) per src/main/etl.js:211-214,243-247,263-267,281-285.
    */
  def fixedWidth(c: Column, leaf: EtlLeaf): Column = {
    val n = leaf.size.getOrElse(
      throw new IllegalArgumentException(s"fixed-width render needs size for ${leaf.tpe}"))
    leaf.tpe.toLowerCase match {
      case "boolean" =>
        // null renders as SPACES (reference 'Boolean' null branch,
        // src/main/etl.js:211-214) — zeros are the encoding of FALSE, so
        // null-as-zeros would make null and false indistinguishable
        when(c.isNull, lpad(lit(""), n, " "))
          .when(c.cast(BooleanType), lpad(lit("1"), n, "0"))
          .otherwise(lpad(lit(""), n, "0"))
      case "number" =>
        when(c.isNull, lpad(lit(""), n, " ")).otherwise(lpad(c.cast(StringType), n, "0"))
      case "date" =>
        when(c.isNull, lit("0" * 8)).otherwise(date_format(c, "yyyyMMdd"))
      case "string" | "*" =>
        when(c.isNull, lpad(lit(""), n, " "))
          .otherwise(rpad(substring(c.cast(StringType), 1, n), n, " "))
      case other =>
        throw new IllegalArgumentException(s"unknown schema type: $other")
    }
  }

  /** Closed-world structural check (driver-side, schema-vs-schema — free):
    * unknown input columns and missing spec columns are errors at EVERY
    * nesting level, matching src/main/etl.js:313-318 (the reference
    * recurses the spec over the object tree). Trails are dotted paths.
    */
  def checkClosedWorld(df: DataFrame, obj: EtlObj): Unit =
    checkLevel(df.schema, obj, prefix = "")

  private def checkLevel(st: StructType, obj: EtlObj, prefix: String): Unit = {
    def at(n: String) = if (prefix.isEmpty) n else s"$prefix.$n"
    val have = st.fieldNames.toSet
    val want = obj.fields.map(_._1).toSet
    val unknown = (have -- want).map(at)
    val missing = (want -- have).map(at)
    require(unknown.isEmpty, s"applySchema: unknown properties $unknown")
    require(missing.isEmpty, s"applySchema: missing properties $missing")
    obj.fields.foreach {
      case (name, o: EtlObj) => st(name).dataType match {
        case nested: StructType => checkLevel(nested, o, at(name))
        case other => throw new IllegalArgumentException(
          s"applySchema: ${at(name)} declared as object but input is $other")
      }
      case (name, EtlArr(o: EtlObj)) => st(name).dataType match {
        case ArrayType(nested: StructType, _) => checkLevel(nested, o, at(name))
        case other => throw new IllegalArgumentException(
          s"applySchema: ${at(name)} declared as object array but input is $other")
      }
      case _ => ()
    }
  }

  /** applySchema over a flat DataFrame: coerce every column per the spec.
    * Nested object/array schemas coerce through struct/array rebuilds.
    */
  def applySchema(df: DataFrame, obj: EtlObj): DataFrame = {
    checkClosedWorld(df, obj)
    df.select(obj.fields.map { case (name, s) => coerceAny(col(name), s).as(name) }: _*)
  }

  private def coerceAny(c: Column, s: EtlSchema): Column = s match {
    case l: EtlLeaf => coerce(c, l)
    case EtlArr(e)  => transform(c, x => coerceAny(x, e))
    case EtlObj(fs) => struct(fs.map { case (k, v) => coerceAny(c.getField(k), v).as(k) }: _*)
  }

  /** applySchema in fixed-width mode: every leaf rendered and concatenated,
    * in spec order, into a single `value` string column (the flat-file
    * sink of SURVEY §2.1 S9).
    */
  def applyFixedWidth(df: DataFrame, obj: EtlObj): DataFrame = {
    checkClosedWorld(df, obj)
    val rendered = obj.fields.map { case (name, s) =>
      s match {
        case l: EtlLeaf => fixedWidth(coerce(col(name), l), l)
        case other => throw new IllegalArgumentException(
          s"fixed-width mode needs flat leaves, got $other for $name")
      }
    }
    df.select(concat(rendered: _*).as("value"))
  }
}
