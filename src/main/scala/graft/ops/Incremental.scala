package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Num

/** Incremental aggregate maintenance — materialized-view refresh
  * without rescanning history.
  *
  * The state is the classic mergeable partial-aggregate tuple per group:
  * `(cnt, sum, min, max)`. New data folds in as `state(newBatch)` merged
  * with the stored state — a union + re-aggregation whose left side is
  * |groups| rows, not |history| rows. At 100 TB this is the difference
  * between a daily refresh that reads one day and one that reads three
  * years: history is touched ZERO times after its first aggregation.
  * Averages (and any other algebraic aggregate) derive from the state at
  * read time, which is why `avg` is not stored — storing it would make
  * the state non-mergeable.
  *
  * The same merge is the natural `foreachBatch` sink for a streaming
  * ingest (StreamingSpec proves stream-folded state equals the one-shot
  * batch aggregate), and the state tuple is exactly what Spark's own
  * partial aggregation emits map-side — this operator persists that
  * intermediate across runs instead of recomputing it.
  *
  * Engine extension surface (no reference analogue — the reference
  * recomputes its views per run against the RDBMS).
  */
object Incremental {

  /** Aggregate a batch to its mergeable state:
    * `(keys…, cnt, sum_val, min_val, max_val)` with the value taken as
    * a long (callers convert money to integer cents first — the
    * engine's exact-sum idiom; a double sum would make the merged
    * result order-dependent).
    */
  def aggState(df: DataFrame, keys: Seq[String], valCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valCol).cast("long")).as("sum_val"),
        min(col(valCol).cast("long")).as("min_val"),
        max(col(valCol).cast("long")).as("max_val"))

  /** Merge any number of states (stored + new batches): counts and sums
    * add, mins/maxes fold. Idempotence caveat: merge is NOT idempotent
    * over the same batch twice (cnt/sum double) — exactly-once delivery
    * is the caller's contract, e.g. foreachBatch's batchId dedup.
    */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).cast("long").as("cnt"),
        sum(col("sum_val")).cast("long").as("sum_val"),
        min(col("min_val")).as("min_val"),
        max(col("max_val")).as("max_val"))
  }

  /** Derive the read-time view from a state: the stored tuple plus the
    * algebraic average (r6-rounded, the cross-engine grid).
    */
  def finalizeState(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(col("cnt"), col("sum_val"),
      col("min_val"), col("max_val"),
      Num.r6(col("sum_val").cast("double") / col("cnt").cast("double")).as("avg_val")): _*)
}
