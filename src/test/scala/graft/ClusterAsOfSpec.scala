package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Dedup
import graft.ops.AsOfJoin

/** Connected-components dedup clustering and the as-of join. */
class ClusterAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connectedComponents: returned labels claim a hash-partitioned layout (keyed checkpoint, not UnknownPartitioning)") {
    // the round-21 §2.4 fix: the loop's per-round state and the static
    // edge relation materialize through the partitioning-preserving
    // checkpoint, so (a) each propagation round re-joins without
    // re-exchanging the materialized side and (b) the RETURNED label
    // relation hands its hash(node) layout to the caller's join-back
    // (dedup_clusters' left join elides the label-side exchange).
    // Assert (b) directly on the plan: the final checkpoint scan must
    // carry a HashPartitioning claim.
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, SinglePartition}
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (9L, 10L)).toDF("d1", "d2")
    val cc = Dedup.connectedComponents(pairs)
    val lrs = cc.queryExecution.optimizedPlan.collect { case l: LogicalRDD => l }
    assert(lrs.nonEmpty, "labels must come from a checkpointed relation")
    // tiny graphs legitimately claim SinglePartition (the scale-adaptive
    // count collapses to 1, which satisfies every clustered
    // distribution); what must never come back is UnknownPartitioning
    assert(lrs.forall(l => l.outputPartitioning.isInstanceOf[HashPartitioning]
        || l.outputPartitioning == SinglePartition),
      s"checkpointed labels lost their keyed layout: " +
        s"${lrs.map(_.outputPartitioning).mkString(", ")}")
  }

  test("connectedComponents: path graph converges to min label across the chain") {
    // 1-2, 2-3, 3-4 is the worst case for min propagation (diameter 3);
    // 9-10 a separate component
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (9L, 10L)).toDF("d1", "d2")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 9L, 10L -> 9L))
  }

  test("large-star/small-star agrees with min-propagation on a long chain") {
    // a 40-node path is min-propagation's worst case; stars must close
    // it within the 20-round bound and produce identical labels
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("d1", "d2")
    val stars = Dedup.connectedComponentsStars(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars == (1L to 40L).map(_ -> 1L).toMap)
  }

  test("large-star/small-star matches min-propagation on a random-ish multigraph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(120)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
      .toDF("d1", "d2")
    val a = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.connectedComponentsStars(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("clusterAssignments: singletons are their own canonical cluster") {
    val docs = Seq(1L, 2L, 3L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 3L)).toDF("d1", "d2")
    val out = Dedup.clusterAssignments(docs, "doc_id", pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((1L, 1L, true), (3L, 1L, false), (2L, 2L, true), (7L, 7L, true)))
  }

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("asOf: latest right row at-or-before each left row, per key") {
    val left = Seq((1L, 100L, ts(10)), (2L, 100L, ts(30)), (3L, 200L, ts(5)))
      .toDF("lid", "k", "t")
    val right = Seq((100L, ts(10), "a"), (100L, ts(20), "b"), (200L, ts(50), "z"))
      .toDF("k", "t", "tag")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("tag" -> "rtag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    // lid=1: right at the SAME instant matches (<=); lid=2: latest of a,b;
    // lid=3: no right row at or before -> null
    assert(out == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None))
  }

  test("asOf: payload fields stay row-consistent when a right field is null") {
    val left = Seq((1L, 5L, ts(30))).toDF("lid", "k", "t")
    val right = Seq((5L, ts(10), Some("old"), Some(7L)), (5L, ts(20), None, Some(9L)))
      .toDF("k", "t", "tag", "n")
    val row = AsOfJoin.asOf(left, right, "k", "t",
      Seq("tag" -> "rtag", "n" -> "rn")).collect().head
    // the ts(20) row matched: its tag is genuinely null — must NOT fall
    // back to the older row's "old"
    assert(row.isNullAt(row.fieldIndex("rtag")))
    assert(row.getLong(row.fieldIndex("rn")) == 9L)
  }

  test("asOf dedupeRight: (key,time) ties resolve to the max payload, deterministically") {
    val left = Seq((1L, 5L, ts(30))).toDF("lid", "k", "t")
    // two right rows at the SAME (key, time) — without dedupeRight the
    // winner would be partition-order luck
    val right = Seq((5L, ts(10), "x"), (5L, ts(10), "y")).toDF("k", "t", "tag")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("tag" -> "rtag"),
      dedupeRight = true).collect().head
    assert(out.getString(out.fieldIndex("rtag")) == "y")
  }

  test("asOf WITHOUT dedupeRight is still deterministic on duplicate (key,time) right rows") {
    val left = Seq((1L, 5L, ts(30))).toDF("lid", "k", "t")
    // shuffle the duplicates across many partitions so a partition-order
    // tie-break would flap; the payload-ordered window must still pick
    // the max payload ("y") — identical to dedupeRight's answer
    val right = Seq((5L, ts(10), "x"), (5L, ts(10), "y"), (5L, ts(10), "m"))
      .toDF("k", "t", "tag").repartition(7)
    for (_ <- 1 to 3) {
      val out = AsOfJoin.asOf(left, right, "k", "t", Seq("tag" -> "rtag"))
        .collect().head
      assert(out.getString(out.fieldIndex("rtag")) == "y")
      val buck = AsOfJoin.asOfBucketed(left, right, "k", "t", Seq("tag" -> "rtag"),
        t => floor(unix_timestamp(t) / lit(600L))).collect().head
      assert(buck.getString(buck.fieldIndex("rtag")) == "y")
    }
    // seed path: left row in a LATER bucket than the duplicated right
    // rows — the bucket-last aggregation must also pick "y"
    val farLeft = Seq((2L, 5L, ts(45))).toDF("lid", "k", "t")
    val seeded = AsOfJoin.asOfBucketed(farLeft, right, "k", "t", Seq("tag" -> "rtag"),
      t => floor(unix_timestamp(t) / lit(600L))).collect().head
    assert(seeded.getString(seeded.fieldIndex("rtag")) == "y")
  }

  test("asOfBucketed matches asOf on a hot key and splits it across time buckets") {
    // one hot key with 60 left events across an hour + sparse right rows;
    // buckets of 10 minutes -> the hot key's window work spreads over 6
    // (key, bucket) partitions instead of one
    val left = ((0 until 60).map(m => (m.toLong, 1L, ts(m))) :+ (100L, 2L, ts(30)))
      .toDF("lid", "k", "t")
    val right = Seq((1L, ts(5), "a"), (1L, ts(25), "b"), (1L, ts(45), "c"),
      (2L, ts(10), "z")).toDF("k", "t", "tag")
    val bucketOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => floor(unix_timestamp(t) / lit(600L))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> Option(r.getString(r.fieldIndex("rtag")))).toMap
    val base = asMap(AsOfJoin.asOf(left, right, "k", "t", Seq("tag" -> "rtag")))
    val buck = asMap(AsOfJoin.asOfBucketed(left, right, "k", "t",
      Seq("tag" -> "rtag"), bucketOf))
    assert(buck == base)
    // minute 30-39 bucket has NO right rows: its seed must carry "b"
    assert(buck(32L).contains("b"))
    // the hot key genuinely split: >1 bucket, and no bucket holds all rows
    val perBucket = left.filter(col("k") === 1L)
      .groupBy(bucketOf(col("t"))).count().collect().map(_.getLong(1))
    assert(perBucket.length > 1 && perBucket.max < 60)
  }

  test("asOf: no shuffle beyond one exchange per side and no cartesian") {
    val left = Seq((1L, 5L, ts(1))).toDF("lid", "k", "t")
    val right = Seq((5L, ts(1), "x")).toDF("k", "t", "tag")
    val plan = AsOfJoin.asOf(left, right, "k", "t", Seq("tag" -> "rtag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"), s"nested-loop join in plan:\n$plan")
  }
}
