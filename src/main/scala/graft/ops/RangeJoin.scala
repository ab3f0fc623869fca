package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join: match point rows to interval rows
  * with `start <= point <= end` when there is NO shared equi-key.
  *
  * Spark plans a bare inequality join as a nested-loop/cartesian —
  * O(points × intervals), dead at scale. The bucket trick restores an
  * equi-join: pick a bucket width, explode each interval to every
  * bucket it covers, map each point to its single containing bucket,
  * equi-join on the bucket id, then apply the exact range predicate.
  * Each (point, interval) match is found EXACTLY once — the point
  * lives in one bucket and the interval covers that bucket once — so
  * no dedup pass is needed.
  *
  * Cost model: interval replication = interval_span / bucketWidth
  * rows; bucket join fan-in = points_per_bucket ×
  * intervals_overlapping_bucket. Pick bucketWidth near the MEDIAN
  * interval span — much smaller explodes long intervals, much larger
  * piles unrelated points and intervals into the same bucket. Skewed
  * bucket occupancy (rush-hour points) is ordinary equi-join skew,
  * handled by AQE's skew splitting.
  */
object RangeJoin {

  /** @param pointCol   long/timestamp column of `points` (cast to long seconds)
    * @param startCol   inclusive interval start on `intervals`
    * @param endCol     inclusive interval end
    * @param bucketSecs bucket width in seconds
    */
  def bucketed(points: DataFrame, intervals: DataFrame,
               pointCol: String, startCol: String, endCol: String,
               bucketSecs: Long): DataFrame = {
    require(bucketSecs > 0, "bucketSecs must be positive")
    val pB = points.withColumn("_b",
      floor(col(pointCol).cast("long") / bucketSecs).cast("long"))
    val iB = intervals.withColumn("_b",
      explode(sequence(
        floor(col(startCol).cast("long") / bucketSecs).cast("long"),
        floor(col(endCol).cast("long") / bucketSecs).cast("long"))))
    // exact predicate on the RAW values (full precision — the long cast
    // is only bucket assignment, truncating it into the filter would
    // admit sub-second false positives on timestamp columns)
    pB.join(iB, Seq("_b"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("_b")
  }
}
