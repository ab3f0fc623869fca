package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location — the storage-side answer to the one
  * shuffle the view/join DSL cannot optimize away: a fact⋈dim join on
  * a key both sides are large on.
  *
  * `spark.write.bucketBy(n, key)` hash-partitions rows into `n` fixed
  * buckets AT WRITE TIME and records the layout in the catalog; a later
  * join of two tables bucketed on the same key with the same `n` reads
  * bucket i against bucket i directly — NO Exchange on either side
  * (asserted in BucketingSpec, with a non-bucketed negative control).
  * At 100 TB this converts every recurring join/aggregation on the
  * bucket key from a full-corpus shuffle (the dominant cost) into a
  * co-located merge — the classic pay-once-at-ingest trade. `sortBy`
  * additionally orders rows inside each bucket file so the merge join
  * can skip its sort when files-per-bucket is 1.
  *
  * This is engine extension surface (no reference analogue — the
  * reference's RDBMS handles physical layout): the capability a Spark
  * deployment of the reference's recurring view queries
  * (`ops/ViewDsl.scala`) would standardize on for their join keys.
  */
object Bucketing {

  /** Write `df` as a bucketed (and in-bucket sorted) managed parquet
    * table. `overwrite` replaces the table atomically-enough for batch
    * recompute pipelines; the bucket count is part of the table's
    * contract — joins co-locate only across tables sharing (key, n).
    *
    * SINGLE WRITER PER TABLE NAME: the drop + location-delete +
    * saveAsTable sequence below is not atomic, so two concurrent
    * writers of the SAME table name can interleave (one dropping or
    * deleting the other's in-progress write). Callers must serialize
    * writes per table name — the gate registry does it by deriving
    * names from a digest of the fixture dir (distinct dirs → distinct
    * tables) and running same-dir suites sequentially. Concurrent
    * writers of DIFFERENT names are safe.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = df.sparkSession
    // A managed-table dir left behind by a previous JVM is invisible to
    // this JVM's fresh in-memory catalog, so saveAsTable would fail with
    // LOCATION_ALREADY_EXISTS; drop the catalog entry and delete any
    // orphan location so the write is idempotent across processes.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Append into an existing [[writeBucketed]] table (Spark validates
    * that key and bucket count match the table's spec). The append-only
    * half of an ingest log: history is never rewritten — each batch
    * adds bucketed files — which is what makes the layout streamable
    * (a `foreachBatch` sink can call this per micro-batch). Same
    * single-writer-per-table contract as [[writeBucketed]].
    */
  def appendBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    df.write.mode("append")
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Write a SMALL (dimension-sized by contract) managed parquet table
    * un-bucketed — the sidecar half of a pay-once index layout (e.g.
    * the IVF centroid table next to its cluster-bucketed corpus). Same
    * drop + orphan-location-delete idempotence and the same
    * single-writer-per-table contract as [[writeBucketed]].
    */
  def writeSmall(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Join two same-key, same-bucket-count tables written by
    * [[writeBucketed]]: a plain equi-join — bucketing makes Catalyst
    * plan it exchange-free on both sides.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
