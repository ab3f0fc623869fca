package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning — cut the big side of a selective
  * join BEFORE its shuffle.
  *
  * The pattern Spark's own `InjectRuntimeFilter` rule applies when its
  * thresholds line up, exposed as an explicit operator so a pipeline can
  * apply it deliberately: aggregate the small (already-filtered) side
  * into one fixed-size bloom filter (`BloomFilterAggregate` over
  * `xxhash64(key)` — distributed, mergeable, one binary blob out), then
  * filter the big side with `BloomFilterMightContain` ahead of the exact
  * join. False positives only let a few extra rows REACH the join —
  * which discards them — so the final result is exactly the plain
  * join's; what changes is the exchange: at 100 TB, a 1%-selective dim
  * filter means ~99% of the fact rows are dropped at the SCAN's map
  * side instead of being shuffled, for the cost of one broadcast-sized
  * bitmap (`numBits`/8 bytes) evaluated as a codegen'd expression.
  *
  * The blob is collected once on the driver and re-enters the plan as a
  * binary literal — the k-means-centroid idiom: a fixed-size aggregate
  * of the data, never the data itself.
  */
object Prune {

  /** Filter `big` to rows whose `bigKey` might be in `small`'s
    * `smallKey` set. Follow with the exact join; results are identical
    * to joining without the filter (PlanSpec asserts the pruned plan's
    * scan-side filter, SketchGates' gate pins result equality through
    * the DuckDB oracle).
    *
    * @param expectedItems sizing hint for the bloom (distinct smallKey
    *                      estimate); with `numBits` fixed it sets the
    *                      hash count k = max(1, round(ln2 · bits/items))
    * @param numBits       bitmap size; 2^20 bits = 128 KiB ≈ 0.1% false
    *                      positives at 10^5 items
    */
  def bloomSemiFilter(big: DataFrame, bigKey: Column,
                      small: DataFrame, smallKey: Column,
                      expectedItems: Long = 100000L,
                      numBits: Long = 1L << 20): DataFrame = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(smallKey))),
      Literal(expectedItems), Literal(numBits))
    val blob = small.select(GraftBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    // an empty small side yields a NULL blob: nothing can match, and
    // BloomFilterMightContain(NULL, _) is NULL → filter drops all rows,
    // which is exactly the correct semi-join result
    big.filter(GraftBridge.column(new BloomFilterMightContain(
      Literal(blob, BinaryType),
      new XxHash64(Seq(GraftBridge.expression(bigKey))))))
  }
}
