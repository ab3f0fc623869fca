package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Bucketing

/** Exactly-once streaming ingest into a [[graft.ops.Bucketing]] bucketed
  * log — the `foreachBatch` sink that closes the loop between the
  * streaming maintenance twins and the persisted-index layer.
  *
  * Structured Streaming's `foreachBatch` contract is AT-LEAST-ONCE: after
  * a failure the engine replays the last micro-batch with the SAME
  * `batchId`. A naive `appendBucketed` sink would duplicate that batch's
  * rows — and a duplicated batch in an ingest log silently corrupts every
  * index fold built over it. This sink makes the append idempotent per
  * batch id with a tiny commit-log sidecar `<table>_commits (batch_id)`:
  * an already-committed id is skipped entirely, so re-delivery is a no-op
  * (StreamingSpec's replay test pins exactly that).
  *
  * Scale shape: the commit log holds ONE row per micro-batch (batches per
  * deployment lifetime — thousands, not corpus-sized), so the membership
  * probe is a bounded scan; the data append is batch-sized bucketed file
  * appends, never a corpus rewrite — the [[Bucketing.appendBucketed]]
  * streamability property.
  *
  * HONEST ATOMICITY NOTE: the data append and the commit record are two
  * writes. A crash BETWEEN them (data landed, commit didn't) makes the
  * next replay of that batch id duplicate its rows — the classic
  * two-writes window a transactional table format (or a staged
  * rename-publish) closes and plain parquet tables cannot. The window is
  * one batch wide and only on crash; deployments that cannot tolerate it
  * should reconcile at the periodic index rebuild (dedup on a batch-id
  * column) or sink into a transactional format. Committing FIRST would
  * trade duplication for silent LOSS, which is strictly worse for an
  * ingest log.
  *
  * Single-writer-per-table contract, as everywhere in [[Bucketing]]: one
  * streaming query owns a log table; concurrent writers race the
  * create/append sequence.
  */
object BucketedLogSink {

  private def commitsTable(table: String): String = s"${table}_commits"

  /** Has `batchId` already been committed into `table`'s log? Bounded:
    * the commit log is batches-sized by construction.
    */
  def alreadyCommitted(spark: org.apache.spark.sql.SparkSession,
                       table: String, batchId: Long): Boolean =
    ExactlyOnce.committed(spark, commitsTable(table), batchId)

  /** Idempotently append one micro-batch into the bucketed log `table`.
    * First-ever batch creates the table ([[Bucketing.writeBucketed]]);
    * later batches append ([[Bucketing.appendBucketed]] — bucket count
    * re-read from the catalog, mismatch impossible). Returns true iff
    * rows were appended (false = batch id already committed, no-op).
    */
  def exactlyOnceAppend(batch: DataFrame, batchId: Long, table: String,
                        key: String, nBuckets: Int): Boolean = {
    val spark = batch.sparkSession
    ExactlyOnce.once(spark, commitsTable(table), batchId) {
      if (spark.catalog.tableExists(table))
        Bucketing.appendBucketed(batch, table, key,
          Bucketing.bucketCountOf(spark, table))
      else Bucketing.writeBucketed(batch, table, key, nBuckets)
    }
  }

  /** The `foreachBatch` function: `stream.writeStream.foreachBatch(
    * BucketedLogSink.sink(table, key, n)).start()`.
    */
  def sink(table: String, key: String, nBuckets: Int)
      : (DataFrame, Long) => Unit =
    (batch, batchId) => { exactlyOnceAppend(batch, batchId, table, key, nBuckets); () }
}
