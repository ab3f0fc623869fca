package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.Retrieval

/** BM25 / rank-fusion semantics: scalar-reference score parity, the
  * classic IR orderings (rare term wins, shorter doc wins at equal tf),
  * and RRF's consensus property.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def topDocs(df: DataFrame, qid: String): Seq[Long] =
    df.filter(col("query_id") === qid).orderBy(col("rank"))
      .collect().map(_.getLong(1)).toSeq

  test("BM25: scalar-reference score parity on a hand-built corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "red fox jumps"),
      (2L, "red red dog"),
      (3L, "blue whale swims far away today")).toDF("doc_id", "text")
    val qs = Seq(("q", "red")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", topK = 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // scalar replica of the exact arithmetic: N=3, df(red)=2, dl=3/3/6,
    // avgdl=4; idf and term r6'd, micro-summed
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val idf = r6(math.log((3.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0))
    def score(tf: Double, dl: Double) = {
      val term = r6(idf * (tf * 2.2d) / (tf + 1.2d * (0.25d + 0.75d * dl / 4.0d)))
      r6(math.floor(term * 1e6 + 0.5) / 1e6)
    }
    assert(got === Map(1L -> score(1, 3), 2L -> score(2, 3)),
      s"got $got, doc 3 (no match) must be absent")
    assert(got(2L) > got(1L), "higher tf at equal length must score higher")
  }

  test("BM25: rare term outranks ubiquitous term; shorter doc wins at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common rare alpha beta"),
      (2L, "common alpha beta gamma"),
      (3L, "common delta epsilon zeta"),
      (4L, "common theta iota kappa lambda mu nu xi")).toDF("doc_id", "text")
    // 'rare' df=1, 'common' df=4: the doc holding the rare term must
    // rank first for a rare+common query
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(("q", "rare common")).toDF("qid", "qtext"), "qid", "qtext", topK = 4)
    assert(topDocs(got, "q").head === 1L)
    // common-only query: equal tf=1 everywhere, so the SHORTEST doc
    // scores highest (b=0.75 length normalization) and the longest last
    val common = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(("c", "common")).toDF("qid", "qtext"), "qid", "qtext", topK = 4)
    val order = topDocs(common, "c")
    assert(order.last === 4L, s"longest doc must rank last: $order")
  }

  test("ingested BM25 index: bit-identical to tokenize-per-call, corpus never re-scanned") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    import spark.implicits._
    val qs = Seq(("q1", "spark window join"), ("q2", "hash merge sort"))
      .toDF("qid", "qtext")
    val table = "graft_bm25_retrievalspec_idx"
    Retrieval.ingestBm25(docs, "doc_id", "text", table, nBuckets = 4)
    val ing = Retrieval.bm25TopKIngested(spark, table, qs, "qid", "qtext", topK = 10)
    val per = Retrieval.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", topK = 10)
    // parity: the persisted postings ARE the per-call tokenizer's
    // output (integer counts round-trip parquet exactly), and the
    // scoring half is literally shared code
    assert(ing.collect().toSet == per.collect().toSet,
      "ingested-index BM25 diverged from the tokenize-per-call path")
    // the probe plan must not read the document corpus — tokenization
    // happened once at ingest (the twin's entire point)
    val p = ing.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"),
      "ingested BM25 probe re-scanned the document corpus")
  }

  test("RRF: consensus across lists beats a single-list ranking; self-fusion preserves order") {
    import spark.implicits._
    // list A ranks docs 1,2,3; list B ranks 2,4,5 — doc 2 (rank 2 in
    // both) must beat doc 1 (rank 1 in only one list): 2/(60+2) > 1/61
    val a = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3)).toDF("query_id", "doc", "rank")
    val b = Seq(("q", 2L, 2), ("q", 4L, 1), ("q", 5L, 3)).toDF("query_id", "doc", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), topK = 5)
    val order = topDocs(fused, "q")
    assert(order.head === 2L, s"consensus doc must lead: $order")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val s2 = fused.filter(col("doc") === 2L).collect().head.getDouble(2)
    assert(s2 === r6(2 * math.floor(r6(1.0 / 62.0) * 1e6 + 0.5) / 1e6))
    // fusing a list with itself: scores double, order unchanged
    val selfFused = Retrieval.rrfFuse(Seq(a, a), topK = 3)
    assert(topDocs(selfFused, "q") === Seq(1L, 2L, 3L))
  }

  test("evalRanking: self-eval is perfect; absent-query and disjoint systems score zero") {
    import spark.implicits._
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (2L, 20L, 1))
      .toDF("query_id", "nn_id", "rank")
    val perfect = Retrieval.evalRanking(truth, truth, k = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(perfect(1L) === ((3, 3, 1.0, 1.0, 1.0)))
    assert(perfect(2L) === ((1, 1, 1.0, 1.0, 1.0)))
    // system knows nothing about query 2 and misses everything on query
    // 1: both must still be REPORTED (zeros), not silently dropped
    val sys = Seq((1L, 99L, 1)).toDF("query_id", "nn_id", "rank")
    val zero = Retrieval.evalRanking(sys, truth, k = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(zero(1L) === ((0, 0.0, 0.0, 0.0)))
    assert(zero(2L) === ((0, 0.0, 0.0, 0.0)))
  }

  test("evalRanking: partial overlap matches the scalar metric formulas") {
    import spark.implicits._
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def gm(r: Int) = math.floor(r6(1.0 / (math.log(r + 1.0) / math.log(2.0))) * 1e6 + 0.5).toLong
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "nn_id", "rank")
    // system: relevant 11 at rank 1, junk at 2, relevant 10 at rank 3
    val sys = Seq((1L, 11L, 1), (1L, 99L, 2), (1L, 10L, 3))
      .toDF("query_id", "nn_id", "rank")
    val row = Retrieval.evalRanking(sys, truth, k = 3).collect().head
    assert(row.getInt(1) === 3 && row.getInt(2) === 2)
    assert(row.getDouble(3) === r6(2.0 / 3.0), "recall@3")
    assert(row.getDouble(4) === 1.0, "first relevant hit is at system rank 1")
    val ndcg = r6((gm(1) + gm(3)).toDouble / (gm(1) + gm(2) + gm(3)).toDouble)
    assert(row.getDouble(5) === ndcg, "nDCG from micro-unit gains")
  }
}
