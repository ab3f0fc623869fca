package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming over the `events` shape. The reference is purely
  * batch (SURVEY §2.8) — this is the engine's forward-looking stream
  * surface: the SAME aggregation as the batch `events_window_agg` query,
  * expressed over an unbounded source with watermarked tumbling windows,
  * so a user can swap batch for streaming without changing semantics.
  *
  * Scale design: windowed count/min/max aggregates partially on the map
  * side, state is bounded by the watermark (2h of open windows per
  * event_type), and the sink sees one row per (window, type) — no
  * per-event state.
  */
object EventStream {

  /** Tumbling 1-hour window counts + value min/max per event type, with a
    * 2-hour watermark for late data. Works on both streaming and batch
    * DataFrames (same plan, Catalyst picks the stateful version under
    * `readStream`).
    */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("min_value"), col("max_value"))

  /** Unbounded parquet-directory source with an explicit schema (streaming
    * scans cannot infer).
    */
  def fromParquetDir(s: SparkSession, dir: String, schema: StructType): DataFrame =
    s.readStream.schema(schema).parquet(dir)

  /** Start the windowed aggregate into an in-memory sink (demo/test
    * harness; production would use a kafka/parquet sink with a
    * checkpoint location).
    */
  def startMemorySink(agg: DataFrame, queryName: String) =
    agg.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .start()
}
