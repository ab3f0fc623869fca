package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: attach to each left row the LATEST right row with
  * `right.time <= left.time` for the same key (the classic event/quote
  * alignment — "which click preceded this purchase").
  *
  * Spark has no native as-of join; a naive formulation
  * (`l JOIN r ON l.key = r.key AND r.ts <= l.ts` + per-pair max) is a
  * per-key cartesian — quadratic in events-per-key, dead at 100 TB.
  * This implementation is the scale shape: UNION both sides tagged,
  * then ONE shuffle by key and ONE sort by (time, side) feeding a
  * running `last(ignoreNulls)` carry-forward window — identical cost to
  * a single windowed aggregation over the combined stream, regardless
  * of how many right rows precede each left row. At equal timestamps
  * the right row sorts BEFORE the left row, so a same-instant right row
  * is visible to the left row (`<=`, not `<`).
  *
  * The whole right row travels as ONE nullable struct, so all payload
  * fields always come from the SAME matched right row (per-column
  * carry-forward would mix rows when a right field is legitimately
  * null).
  *
  * Right rows must be unique per (key, time) — the standard as-of
  * precondition; pre-aggregate the right side otherwise (ties within
  * one timestamp have no defined "latest").
  */
object AsOfJoin {

  /** @param payload right-side columns to carry: (rightCol -> outputCol).
    *                Output columns must not collide with left columns.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
           payload: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists { case (_, o) => leftCols.contains(o) },
      s"payload output names collide with left columns: ${payload.map(_._2).mkString(",")}")
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val pType = StructType(payload.map { case (r, o) =>
      org.apache.spark.sql.types.StructField(o, rightTypes(r), nullable = true)
    })

    // tagged union: left rows carry a null payload struct, right rows
    // carry null left-only columns; _side orders right(0) before
    // left(1) at equal timestamps
    val lU = left.select(
      leftCols.map(col) :+
        lit(null).cast(pType).as("_p") :+
        lit(1).as("_side"): _*)
    val rU = right.select(
      leftCols.map { c =>
        if (c == keyCol || c == timeCol) col(c)
        else lit(null).cast(leftTypes(c)).as(c)
      } :+
        struct(payload.map { case (r, o) => col(r).as(o) }: _*).as("_p") :+
        lit(0).as("_side"): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lU.unionByName(rU)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    payload.foldLeft(carried.filter(col("_side") === 1)) { case (df, (_, o)) =>
      df.withColumn(o, col("_p").getField(o))
    }.drop("_p", "_side")
  }
}
