package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * Right rows SHOULD be unique per (key, time) — the standard as-of
  * precondition; ties within one timestamp have no defined "latest".
  * When the precondition is violated the result is still DETERMINISTIC
  * for orderable payloads: the carry-forward window orders ties by the
  * payload struct, so the winner is the MAX payload (data-determined,
  * never partition-order-determined) — the same row `dedupeRight = true`
  * would keep. Passing `dedupeRight = true` additionally drops the
  * losers before the shuffle (cheaper when duplicates are plentiful).
  * A payload with a non-orderable column (map type) keeps the legacy
  * behavior — no payload tie-break, duplicate-(key,time) winners are
  * partition-order-dependent — rather than breaking existing callers at
  * analysis time; use `dedupeRight` with orderable columns when the
  * precondition can be violated.
  *
  * Hot keys: `Window.partitionBy(key)` serializes one key's full
  * history through one task. When a single key's event count can
  * exceed a task's memory/time budget, use [[asOfBucketed]] — same
  * semantics, per-task input bounded by the time-bucket width.
  */
object AsOfJoin {

  private def orderablePayload(pType: StructType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(pType)

  /** Tagged union of both sides: left rows carry a null payload struct,
    * right rows carry null left-only columns; `_side` orders right (0)
    * before left (1) at equal timestamps.
    */
  private def taggedUnion(left: DataFrame, right: DataFrame, keyCol: String,
                          timeCol: String, payload: Seq[(String, String)])
      : (DataFrame, DataFrame, StructType) = {
    val leftCols = left.columns.toSeq
    require(!payload.exists { case (_, o) => leftCols.contains(o) },
      s"payload output names collide with left columns: ${payload.map(_._2).mkString(",")}")
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val pType = StructType(payload.map { case (r, o) =>
      org.apache.spark.sql.types.StructField(o, rightTypes(r), nullable = true)
    })
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
    (lU, rU, pType)
  }

  /** Deterministic enforcement of the unique-(key, time) right-side
    * precondition: one partial-aggregated groupBy keeping the MAX payload
    * struct per (key, time) — lexicographic over the payload columns, so
    * the winner is data-determined, never partition-order-determined.
    * Payload column types must be orderable.
    */
  private def dedupe(right: DataFrame, keyCol: String, timeCol: String,
                     payload: Seq[(String, String)]): DataFrame =
    right.groupBy(col(keyCol), col(timeCol))
      .agg(max(struct(payload.map { case (r, _) => col(r) }: _*)).as("_dp"))
      .select(col(keyCol) +: col(timeCol) +:
        payload.map { case (r, _) => col("_dp").getField(r).as(r) }: _*)

  /** @param payload right-side columns to carry: (rightCol -> outputCol).
    *                Output columns must not collide with left columns.
    * @param dedupeRight enforce the unique-(key,time) precondition with a
    *                deterministic pre-aggregation (see [[dedupe]]).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
           payload: Seq[(String, String)], dedupeRight: Boolean = false): DataFrame = {
    val r = if (dedupeRight) dedupe(right, keyCol, timeCol, payload) else right
    val (lU, rU, pType) = taggedUnion(left, r, keyCol, timeCol, payload)
    // `_p` as the FINAL sort key makes duplicate-(key, time) right rows
    // deterministic: the last right row before any left row is then the
    // MAX payload struct — exactly what [[dedupe]] keeps — instead of
    // whichever row the shuffle happened to order last. Left rows carry
    // a null `_p`, inert in the ordering (they compare within the
    // _side=1 group only, where `_p` is uniformly null). Skipped when a
    // payload column is not orderable (see the precondition note above).
    val ord = Seq(col(timeCol).asc, col("_side").asc) ++
      (if (orderablePayload(pType)) Seq(col("_p").asc_nulls_first) else Nil)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lU.unionByName(rU)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    payload.foldLeft(carried.filter(col("_side") === 1)) { case (df, (_, o)) =>
      df.withColumn(o, col("_p").getField(o))
    }.drop("_p", "_side")
  }

  /** Hot-key-safe as-of join: identical semantics to [[asOf]], but the
    * carry-forward window partitions by (key, time-bucket) instead of
    * key alone, so no task ever sorts more than one bucket's rows —
    * the per-task bound a 100 TB hot key needs.
    *
    * Cross-bucket continuity is restored by SEED rows: per (key, bucket),
    * one partial-aggregated `max_by` keeps the bucket's latest payload;
    * a window over that tiny per-bucket relation (rows per key = bucket
    * count, not event count) carries the latest payload of any EARLIER
    * bucket into a synthetic right row that sorts before everything in
    * the bucket (null time, side -1). A left row therefore sees either a
    * real right row earlier in its own bucket or its bucket's seed —
    * exactly [[asOf]]'s answer.
    *
    * @param bucketOf maps the time column to a bucket id; must be
    *                 monotone non-decreasing in time (e.g.
    *                 `t => floor(unix_micros(t) / lit(3600000000L))` for
    *                 hourly buckets over a timestamp column).
    */
  def asOfBucketed(left: DataFrame, right: DataFrame, keyCol: String,
                   timeCol: String, payload: Seq[(String, String)],
                   bucketOf: Column => Column,
                   dedupeRight: Boolean = false): DataFrame = {
    val r = if (dedupeRight) dedupe(right, keyCol, timeCol, payload) else right
    val (lU0, rU0, pType) = taggedUnion(left, r, keyCol, timeCol, payload)
    val lU = lU0.withColumn("_b", bucketOf(col(timeCol)).cast("long"))
    val rU = rU0.withColumn("_b", bucketOf(col(timeCol)).cast("long"))

    // latest right payload per (key, bucket): partial-aggregated struct
    // max, never a window over raw events. max over struct(time, _p) —
    // not max_by(_p, time) — so duplicate-(key, time) right rows resolve
    // to the MAX payload deterministically (max_by picks an arbitrary
    // row on ties), matching the main window's tie-break. Non-orderable
    // payloads keep the legacy max_by (arbitrary on exact-time ties)
    val orderable = orderablePayload(pType)
    val bucketLast =
      if (orderable)
        rU.groupBy(col(keyCol), col("_b"))
          .agg(max(struct(col(timeCol).as("t"), col("_p").as("p"))).as("_tp"))
          .select(col(keyCol), col("_b"), col("_tp").getField("p").as("_bp"))
      else
        rU.groupBy(col(keyCol), col("_b"))
          .agg(max_by(col("_p"), struct(col(timeCol), col("_side"))).as("_bp"))
    // carry the latest payload of STRICTLY EARLIER buckets into each
    // bucket's seed; this window's partitions hold one row per bucket
    val wSeed = Window.partitionBy(col(keyCol)).orderBy(col("_b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // seed every bucket that has LEFT rows (a bucket with only right rows
    // needs no seed; a left-only bucket still needs one)
    val leftBuckets = lU.select(col(keyCol), col("_b")).distinct()
    val seeds = bucketLast
      .unionByName(leftBuckets
        .withColumn("_bp", lit(null).cast(pType)), allowMissingColumns = false)
      .groupBy(col(keyCol), col("_b")).agg(max_by(col("_bp"), col("_bp").isNotNull).as("_bp"))
      .withColumn("_seed", last(col("_bp"), ignoreNulls = true).over(wSeed))
      .join(leftBuckets, Seq(keyCol, "_b"), "left_semi")
      .filter(col("_seed").isNotNull)
      .select(lU.columns.map {
        case c if c == keyCol => col(keyCol)
        case "_p"    => col("_seed").as("_p")
        case "_side" => lit(-1).as("_side")
        case "_b"    => col("_b")
        case c       => lit(null).cast(lU.schema(c).dataType).as(c)
      }: _*)

    // per-(key, bucket) carry-forward: seed sorts first (null time sorts
    // first under asc, side -1 breaks same-null ties), right before left
    // at equal times — the asOf ordering within a bounded partition.
    // `_p` last makes duplicate-(key, time) right rows deterministic
    // (max payload wins), mirroring [[asOf]]
    val ord = Seq(col(timeCol).asc_nulls_first, col("_side").asc) ++
      (if (orderable) Seq(col("_p").asc_nulls_first) else Nil)
    val w = Window.partitionBy(col(keyCol), col("_b"))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lU.unionByName(rU).unionByName(seeds)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    payload.foldLeft(carried.filter(col("_side") === 1)) { case (df, (_, o)) =>
      df.withColumn(o, col("_p").getField(o))
    }.drop("_p", "_side", "_b")
  }
}
