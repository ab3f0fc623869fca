package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape checks at sf0.001 — the 100 TB hygiene the bench
  * can't see at small SF: dimension joins must broadcast, equality
  * filters must reach the parquet scan, and the scale-path operators must
  * never contain a cartesian product.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("view_flagship: broadcast joins + filter pushed to parquet scan") {
    val p = plan("view_flagship")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(c_mktsegment,BUILDING)"),
      "where-filter must reach the scan as a pushed filter")
  }

  test("extract lookups broadcast") {
    assert(plan("extract_enrich").contains("BroadcastHashJoin"))
  }

  test("scale-path similarity/dedup plans contain no cartesian product") {
    for (q <- Seq("dedup_embedding_lsh", "similarity_topk_lsh",
      "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("brute-force paths are the only nested-loop consumers") {
    // the documented small-data escape hatches DO use a nested-loop/cross
    // product — assert they are contained there and nowhere else
    assert(plan("dedup_embedding_exact").contains("BroadcastNestedLoopJoin"))
    assert(plan("similarity_topk").contains("BroadcastNestedLoopJoin"))
  }

  test("load_filter compiles to a broadcast anti-join, not a per-row probe") {
    val p = plan("load_filter")
    assert(p.contains("LeftAnti"), p.take(400))
  }

  test("exact dedup partially aggregates map-side") {
    val p = plan("dedup_exact")
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p.take(400))
  }
}
