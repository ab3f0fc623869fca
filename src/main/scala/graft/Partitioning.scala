package graft

import org.apache.spark.sql.DataFrame

/** Partitioning hygiene helpers.
  *
  * `spread` guarantees at least default-parallelism partitions before
  * CPU-heavy per-row expression work (shingling, rolling hashes, dot
  * products, nested-loop self-joins). A small dimension-sized input read
  * from a single parquet file arrives as ONE partition — and every
  * downstream narrow transformation then runs in one task regardless of
  * cluster size. At 100 TB scans have thousands of splits and this is a
  * no-op; the check costs only plan metadata, no job.
  */
object Partitioning {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
