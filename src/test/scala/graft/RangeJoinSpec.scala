package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RangeJoin

/** Bucketed interval join: exact-once matching and plan shape. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("each point-interval containment matched exactly once, across bucket spans") {
    // interval 100-350 spans buckets 1..3 at width 100; point 150 sits in
    // one bucket only; interval 90-110 overlaps bucket 0 and 1
    val points = Seq((1L, 150L), (2L, 105L), (3L, 400L)).toDF("pid", "t")
    val intervals = Seq((10L, 100L, 350L), (20L, 90L, 110L)).toDF("iid", "s", "e")
    val out = RangeJoin.bucketed(points, intervals, "t", "s", "e", bucketSecs = 100L)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, "duplicate matches")
    assert(out.toSet == Set((1L, 10L), (2L, 10L), (2L, 20L)))
  }

  test("agrees with the naive inequality join on random-ish data") {
    val points = (0L until 200L).map(i => (i, i * 37 % 1000)).toDF("pid", "t")
    val intervals = (0L until 20L).map(i => (i, i * 50, i * 50 + 75)).toDF("iid", "s", "e")
    val bucketed = RangeJoin.bucketed(points, intervals, "t", "s", "e", 60L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, col("t").between(col("s"), col("e")))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive && bucketed.nonEmpty)
  }

  test("plan is an equi-join on the bucket, not a nested loop") {
    val points = Seq((1L, 150L)).toDF("pid", "t")
    val intervals = Seq((10L, 100L, 350L)).toDF("iid", "s", "e")
    val p = RangeJoin.bucketed(points, intervals, "t", "s", "e", 100L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join must bucket to an equi-join:\n$p")
  }
}
