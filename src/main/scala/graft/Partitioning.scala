package graft

import org.apache.spark.sql.{DataFrame, GraftBridge}

/** Partitioning hygiene helpers.
  *
  * `spread` guarantees at least default-parallelism partitions before
  * CPU-heavy per-row expression work (shingling, rolling hashes, dot
  * products, nested-loop self-joins). A small dimension-sized input read
  * from a single parquet file arrives as ONE partition — and every
  * downstream narrow transformation then runs in one task regardless of
  * cluster size.
  *
  * The check is gated to narrow-over-file-scan plans and uses only scan
  * metadata ([[GraftBridge.narrowScanSizeBytes]]): estimated scan
  * partitions = ceil(bytes / maxPartitionBytes). Wider plans pass
  * through untouched — their upstream shuffle already redistributed to
  * `spark.sql.shuffle.partitions` — and so do in-memory relations.
  * (Deliberately NOT `df.rdd.getNumPartitions`: with AQE on, accessing
  * `.rdd` materializes every upstream query stage at plan-build time
  * and those results are not reused by the real execution.)
  *
  * At 100 TB scans have thousands of splits and this is a no-op; the
  * estimate costs only catalog metadata, no job.
  */
object Partitioning {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    GraftBridge.narrowScanSizeBytes(df) match {
      case Some(bytes) =>
        val est = math.max(1L, (bytes + GraftBridge.maxPartitionBytes(df) - 1)
          / GraftBridge.maxPartitionBytes(df))
        if (est < target) df.repartition(target) else df
      case None => df
    }
  }

  /** For MULTI-PASS consumers (e.g. Lloyd's k-means rounds, which scan
    * their input once per round): materialize the input across passes
    * when — and only when — its scan is provably small. The signal is
    * the same catalog metadata [[spread]] uses: a narrow scan under
    * `maxBytes` (default 1 GiB) persists MEMORY_AND_DISK (each later
    * pass reads cached blocks instead of re-running scan + shuffle); a
    * larger or non-narrow input passes through and re-scans per pass —
    * you cannot cache 100 TB, and at that size the re-scan IS the
    * algorithm's honest cost. Spark MLlib's KMeans likewise insists on
    * a cached input for its iterations.
    *
    * @param sizeProbe the raw input whose narrow-scan size is measurable
    *                  (pre-spread: a Repartition node hides the scan)
    * @param built     the derived plan (spread + projection) to pin
    */
  def pinForReuse(sizeProbe: DataFrame, built: DataFrame,
                  maxBytes: Long = 1L << 30): DataFrame =
    GraftBridge.narrowScanSizeBytes(sizeProbe) match {
      // persist keeps lineage: a lost executor's blocks recompute, where
      // localCheckpoint blocks are unrecoverable mid-job
      case Some(bytes) if bytes <= maxBytes =>
        built.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case _ => built
    }
}
