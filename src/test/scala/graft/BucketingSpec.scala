package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bucketing

/** Proves the point of [[Bucketing]]: a join of two tables bucketed on
  * the same (key, nBuckets) plans WITHOUT an Exchange on either side,
  * while the identical non-bucketed join shuffles both. The shuffle a
  * bucketed layout removes is the dominant cost of a recurring
  * fact⋈dim join at 100 TB — this spec pins that the plan actually
  * realizes the trade, not just that the API writes files.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def withSortMergeOnly[A](f: => A): A = {
    // force the join shape a LARGE dim would take: broadcast would hide
    // the exchange question entirely (suites run sequentially in this
    // forked JVM, so the scoped conf flip cannot race another spec)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-key same-count bucketed join is exchange-free; non-bucketed control shuffles") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"))
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("custkey"), col("c_nationkey"))
    Bucketing.writeBucketed(orders, "graft_bkt_orders_spec", "custkey", nBuckets = 4)
    Bucketing.writeBucketed(cust, "graft_bkt_cust_spec", "custkey", nBuckets = 4)
    try withSortMergeOnly {
      val bucketed = Bucketing.bucketedJoin(spark,
        "graft_bkt_orders_spec", "graft_bkt_cust_spec", "custkey")
      val bp = bucketed.queryExecution.executedPlan.toString
      assert(bp.contains("SortMergeJoin"), bp.take(500))
      assert(!bp.contains("Exchange"),
        s"bucketed join must be exchange-free on both sides:\n${bp.take(800)}")
      // negative control: the IDENTICAL join over the raw parquet must
      // shuffle — proving the assertion above can fail
      val control = orders.join(cust, Seq("custkey"))
      val cp = control.queryExecution.executedPlan.toString
      assert(cp.contains("Exchange"), "control join unexpectedly exchange-free")
      // and the bucketed result is the same relation
      assert(bucketed.count() == control.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders_spec")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_cust_spec")
    }
  }

  test("bucketed groupBy on the bucket key aggregates without a shuffle") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    Bucketing.writeBucketed(orders, "graft_bkt_agg_spec", "custkey", nBuckets = 4)
    try {
      val agg = spark.table("graft_bkt_agg_spec")
        .groupBy("custkey").agg(sum("o_totalprice").as("total"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"groupBy on the bucket key must reuse the bucketing:\n${p.take(800)}")
      assert(agg.count() > 0)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bkt_agg_spec")
  }
}
