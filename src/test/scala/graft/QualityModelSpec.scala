package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Corpus

/** The trained quality classifier: deterministic hashed-feature logistic
  * regression must SEPARATE an obviously-clean from an obviously-noisy
  * slice after a few full-batch steps, reproduce bit-identically across
  * runs, and handle the degenerate inputs (no features, single-class
  * labels) without dividing by zero or dropping docs silently.
  */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    // clean: stopword-rich English sentences; noisy: high-entropy
    // gibberish — disjoint vocabularies, so the hashed buckets separate
    val clean = (0L until 40L).map { i =>
      (i, s"the quick brown fox jumps over the lazy dog and then the " +
        s"cat sat on the mat while we were reading document $i")
    }
    val noisy = (100L until 140L).map { i =>
      (i, s"zx$i qq7f kpw$i 9ss x0x j$i%7 vv zz qqq" +
        s" ${(i * 7919) % 997} ${(i * 104729) % 31} xk${i % 13}")
    }
    (clean ++ noisy).toDF("doc_id", "text")
  }

  private def labels = {
    import spark.implicits._
    ((0L until 40L).map(_ -> 1) ++ (100L until 140L).map(_ -> 0))
      .toDF("doc_id", "label")
  }

  test("separates clean from noisy after 3 steps; deterministic across runs") {
    def run() = Corpus.qualityModel(fixture, "doc_id", "text", labels,
      nBuckets = 32, steps = 3)
    val out = run().collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out.size === 80, "every featured doc must score")
    val cleanScores = (0L until 40L).map(out(_)._1)
    val noisyScores = (100L until 140L).map(out(_)._1)
    assert(cleanScores.sum / 40 > noisyScores.sum / 40 + 0.1,
      f"no separation: clean mean ${cleanScores.sum / 40}%.3f vs noisy ${noisyScores.sum / 40}%.3f")
    val acc = ((0L until 40L).count(out(_)._2) +
      (100L until 140L).count(!out(_)._2)) / 80.0
    assert(acc >= 0.85, f"train accuracy $acc%.2f below 0.85")
    // byte-reproducibility: the training path is exact-integer + r6'd
    // transcendentals, so a second run is IDENTICAL, not just close
    val again = run().collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(again === out, "training must be bit-reproducible")
  }

  test("streamed training: one-batch sink ≡ batch qualityModel; replay is a no-op; weights accumulate") {
    import spark.implicits._
    val t = "graft_qm_sink_spec"
    val deps = Seq(t, s"${t}_meta", s"${t}_commits")
    deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
    try {
      val labeled = fixture.join(labels, Seq("doc_id"))
      val deliver = Corpus.qualityModelSink(t, "doc_id", "text",
        nBuckets = 32, steps = 3)
      // batch 0 = the whole labeled set: the sink's first delivery must
      // train EXACTLY like the batch operator (same zero start, same
      // steps) — scores bit-identical
      deliver(labeled, 0L)
      val streamed = Corpus.qualityScoreIngested(spark, t, fixture,
        "doc_id", "text").collect().map(_.toString).sorted.toSeq
      val batch = Corpus.qualityModel(fixture, "doc_id", "text", labels,
        nBuckets = 32, steps = 3).collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "one-delivery streamed model must be bit-identical to the batch operator")
      // a REPLAYED batch id must not move the weights (a doubled
      // gradient would shift every score silently)
      val w0 = spark.table(t).collect().map(_.toString).sorted.toSeq
      deliver(labeled, 0L) // at-least-once replay
      assert(spark.table(t).collect().map(_.toString).sorted.toSeq == w0,
        "replayed batch applied its gradient twice")
      // a genuinely NEW batch does move them (training continues)
      deliver(labeled.filter(col("doc_id") < 20), 1L)
      assert(spark.table(t).collect().map(_.toString).sorted.toSeq != w0,
        "a new labeled batch must continue training")
    } finally deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
  }

  test("crash between weights write and commit: the replayed batch does NOT double-apply its gradient") {
    import spark.implicits._
    val clean = "graft_qm_crash_clean"
    val crashed = "graft_qm_crash_sim"
    val deps = Seq(clean, crashed).flatMap(t =>
      Seq(t, s"${t}_meta", s"${t}_commits"))
    deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
    try {
      val labeled = fixture.join(labels, Seq("doc_id"))
      val b0 = labeled.filter(col("doc_id") % 2 === 0)
      val b1 = labeled.filter(col("doc_id") % 2 =!= 0)
      def scores(t: String) = Corpus.qualityScoreIngested(spark, t, fixture,
        "doc_id", "text").collect().map(_.toString).sorted.toSeq
      val cleanDeliver = Corpus.qualityModelSink(clean, "doc_id", "text",
        nBuckets = 32, steps = 2)
      cleanDeliver(b0, 0L); cleanDeliver(b1, 1L)
      val expect = scores(clean)
      // the crash: batch 1's weights landed, the commit record did not
      // — simulated by delivering batch 1 and then striking its row
      // from the commit log before the at-least-once replay arrives
      val deliver = Corpus.qualityModelSink(crashed, "doc_id", "text",
        nBuckets = 32, steps = 2)
      deliver(b0, 0L); deliver(b1, 1L)
      val ct = s"${crashed}_commits"
      val keep = spark.table(ct).where(col("batch_id") =!= 1L)
        .collect().map(_.getLong(0)).toSeq
      graft.ops.Bucketing.writeSmall(keep.toDF("batch_id"), ct)
      deliver(b1, 1L) // the replay of the uncommitted batch
      // an overwrite-style weight table would re-read the already-
      // stepped weights here and apply the gradient twice; the
      // batch-keyed log restarts from the last COMMITTED vector, so the
      // retry's rows are bit-identical to the orphans and scores match
      // the crash-free run exactly
      assert(scores(crashed) == expect,
        "replayed uncommitted batch must restart from the pre-batch weights")
    } finally deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
  }

  test("batch-0 crash after the meta write: the replay restarts from zero under the frozen parameters") {
    import spark.implicits._
    val clean = "graft_qm_meta_clean"
    val crashed = "graft_qm_meta_sim"
    val deps = Seq(clean, crashed).flatMap(t =>
      Seq(t, s"${t}_meta", s"${t}_commits"))
    deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
    try {
      val labeled = fixture.join(labels, Seq("doc_id"))
      def scores(t: String) = Corpus.qualityScoreIngested(spark, t, fixture,
        "doc_id", "text").collect().map(_.toString).sorted.toSeq
      val cleanDeliver = Corpus.qualityModelSink(clean, "doc_id", "text",
        nBuckets = 32, steps = 2)
      cleanDeliver(labeled, 0L)
      // the crash window: meta froze, no weights batch committed —
      // the sink writes meta FIRST precisely so this replay trains from
      // the zero vector under the frozen (nBuckets, steps) instead of
      // silently re-freezing whatever the retry passes
      graft.ops.Bucketing.writeSmall(
        Seq((32, 2)).toDF("nbuckets", "steps"), s"${crashed}_meta")
      val deliver = Corpus.qualityModelSink(crashed, "doc_id", "text",
        nBuckets = 99, steps = 7) // sink params must LOSE to the frozen meta
      deliver(labeled, 0L)
      assert(scores(crashed) == scores(clean),
        "post-meta-crash replay must train from zero under the frozen parameters")
    } finally deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
  }

  test("asOf scoring: the vector at a pinned batch never moves as later batches land") {
    import spark.implicits._
    val t = "graft_qm_asof_spec"
    val deps = Seq(t, s"${t}_meta", s"${t}_commits")
    deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
    try {
      val labeled = fixture.join(labels, Seq("doc_id"))
      def scores(asOf: Option[Long]) = Corpus.qualityScoreIngested(spark, t,
        fixture, "doc_id", "text", asOf).collect().map(_.toString).sorted.toSeq
      val deliver = Corpus.qualityModelSink(t, "doc_id", "text",
        nBuckets = 32, steps = 2)
      deliver(labeled.filter(col("doc_id") % 2 === 0), 0L)
      val at0 = scores(None)
      deliver(labeled.filter(col("doc_id") % 2 =!= 0), 1L)
      assert(scores(Some(0L)) == at0,
        "a pinned model snapshot changed after a later training batch")
      assert(scores(Some(1L)) == scores(None),
        "asOf at the newest batch must equal the current view")
      val e = intercept[IllegalStateException] { scores(Some(-1L)) }
      assert(e.getMessage.contains("asOf"))
    } finally deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
  }

  test("compactQualityModelLog: retention keeps the newest vectors, drops debris, bounds audit depth") {
    import spark.implicits._
    val t = "graft_qm_retention"
    val deps = Seq(t, s"${t}_meta", s"${t}_commits")
    deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
    try {
      val labeled = fixture.join(labels, Seq("doc_id"))
      def scores(asOf: Option[Long]) = Corpus.qualityScoreIngested(spark, t,
        fixture, "doc_id", "text", asOf).collect().map(_.toString).sorted.toSeq
      val deliver = Corpus.qualityModelSink(t, "doc_id", "text",
        nBuckets = 32, steps = 2)
      deliver(labeled.filter(col("doc_id") % 3 === 0), 0L)
      deliver(labeled.filter(col("doc_id") % 3 === 1), 1L)
      deliver(labeled.filter(col("doc_id") % 3 === 2), 2L)
      // plant crash debris: an UNCOMMITTED batch 3's rows in the log
      spark.table(t).where(col("batch_id") === 2L)
        .withColumn("batch_id", lit(3L))
        .localCheckpoint()
        .write.mode("append").format("parquet").saveAsTable(t)
      val head = scores(None)
      val at1 = scores(Some(1L))
      Corpus.compactQualityModelLog(spark, t, keepLast = 2)
      val kept = spark.table(t).select(col("batch_id")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L),
        s"retention must keep exactly the newest 2 committed vectors, got $kept")
      assert(scores(None) == head, "current-view scoring moved under retention")
      assert(scores(Some(1L)) == at1, "an in-horizon snapshot moved under retention")
      // below the horizon: loud failure, never a wrong vector
      val e = intercept[IllegalStateException] { scores(Some(0L)) }
      assert(e.getMessage.contains("no committed training batch"))
      // the commit log is untouched — a replayed old batch stays a no-op
      assert(spark.table(s"${t}_commits").count() == 3L)
      // staged publish left no residue under either staging name
      assert(!spark.catalog.tableExists(s"${t}__compacting") &&
        !spark.catalog.tableExists(s"${t}__precompact"))
    } finally deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
  }

  test("compactQualityModelLog: an interrupted publish fails the next attempt loudly, with both copies recoverable") {
    import spark.implicits._
    val t = "graft_qm_crashpub"
    val deps = Seq(t, s"${t}_meta", s"${t}_commits", s"${t}__precompact",
      s"${t}__compacting")
    deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
    try {
      val labeled = fixture.join(labels, Seq("doc_id"))
      val deliver = Corpus.qualityModelSink(t, "doc_id", "text",
        nBuckets = 32, steps = 2)
      deliver(labeled.filter(col("doc_id") % 2 === 0), 0L)
      deliver(labeled.filter(col("doc_id") % 2 === 1), 1L)
      // simulate a crash between the two renames: the original parked
      // as backup — exactly the window the staged publish leaves open
      spark.sql(s"ALTER TABLE `$t` RENAME TO `${t}__precompact`")
      spark.table(s"${t}__precompact").localCheckpoint()
        .write.format("parquet").saveAsTable(t)
      val e = intercept[IllegalArgumentException] {
        Corpus.compactQualityModelLog(spark, t, keepLast = 1)
      }
      assert(e.getMessage.contains("__precompact"))
      // the guard refused BEFORE touching anything: the weights log and
      // the parked backup both still serve
      assert(spark.table(t).count() > 0 &&
        spark.table(s"${t}__precompact").count() > 0)
    } finally deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
  }

  test("compactQualityModelLog: mid-publish crash with the table name UNOCCUPIED still fails loudly, never no-ops") {
    import spark.implicits._
    val t = "graft_qm_crashmid"
    val deps = Seq(t, s"${t}_meta", s"${t}_commits", s"${t}__precompact",
      s"${t}__compacting")
    deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
    try {
      val labeled = fixture.join(labels, Seq("doc_id"))
      val deliver = Corpus.qualityModelSink(t, "doc_id", "text",
        nBuckets = 32, steps = 2)
      deliver(labeled.filter(col("doc_id") % 2 === 0), 0L)
      // the OTHER crash window of the staged publish: after rename 1,
      // before rename 2 — the log is parked as backup and the table
      // name answers to NOTHING. A tableExists(table) early return
      // would silently no-op here and report a compaction that never
      // ran; the leftover guard must fire FIRST
      spark.sql(s"ALTER TABLE `$t` RENAME TO `${t}__precompact`")
      val e = intercept[IllegalArgumentException] {
        Corpus.compactQualityModelLog(spark, t, keepLast = 1)
      }
      assert(e.getMessage.contains("__precompact"))
      // the parked copy is untouched and recoverable
      assert(spark.table(s"${t}__precompact").count() > 0)
    } finally deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
  }

  test("serving before the first commit fails loudly") {
    import spark.implicits._
    val t = "graft_qm_nocommit"
    val deps = Seq(t, s"${t}_meta", s"${t}_commits")
    deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
    try {
      graft.ops.Bucketing.writeSmall(
        Seq((32, 2)).toDF("nbuckets", "steps"), s"${t}_meta")
      val e = intercept[IllegalStateException] {
        Corpus.qualityScoreIngested(spark, t, fixture, "doc_id", "text")
      }
      assert(e.getMessage.contains("no committed training batch"))
    } finally deps.foreach(d => spark.sql(s"DROP TABLE IF EXISTS `$d`"))
  }

  test("degenerate inputs: no-feature docs absent; single-class labels converge to that class") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "   "),
      (3L, Option.empty[String].orNull)).toDF("doc_id", "text")
    val lab = Seq((1L, 1), (2L, 1), (3L, 0)).toDF("doc_id", "label")
    val out = Corpus.qualityModel(docs, "doc_id", "text", lab,
      nBuckets = 8, steps = 2).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L),
      "whitespace-only and null-text docs carry no evidence and are absent")
    assert(out.head.getDouble(1) > 0.5, "all-positive training must push the score up")
  }

  test("splitByCluster: no near-dup cluster straddles the split; share tracks evalPpm") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = graft.llm.Dedup.minhashLsh(docs, "doc_id", "text",
      n = 3, k = 16, rowsPerBand = 4, threshold = 0.3, maxDocFreq = Some(20))
    val out = Corpus.splitByCluster(docs, "doc_id", pairs, evalPpm = 200000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length === docs.count(), "every document must get a side")
    // THE invariant: a cluster's documents all land on one side —
    // otherwise near-duplicates straddle train/eval and the eval is
    // contaminated by construction
    val straddlers = out.groupBy(_._2).filter(_._2.map(_._3).distinct.size > 1)
    assert(straddlers.isEmpty,
      s"clusters straddling the split: ${straddlers.keys.take(5).mkString(",")}")
    // hash share is approximate at 500 docs — just pin both sides exist
    // and eval is the minority at 20% ppm
    val nEval = out.count(_._3 == "eval")
    assert(nEval > 0 && nEval < out.length / 2,
      s"eval share $nEval/${out.length} implausible for 20% ppm")
  }

  test("packSequences streamCol: caller-keyed streams pack in idCol order per stream") {
    import spark.implicits._
    val sel = Seq(
      (10L, 1, 100L), (10L, 2, 200L), (10L, 3, 30L),
      (20L, 1, 300L), (20L, 2, 10L)).toDF("qid", "rk", "nt")
    val packed = Corpus.packSequences(sel, "rk", "nt", capacity = 256,
      streamCol = Some("qid"))
      .collect().map(r => (r.getLong(2), r.getInt(0)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // stream 10: offsets 0, 100, 300; capacity 256 ⇒ doc 2 straddles
    assert(packed((10L, 1)) === ((0L, 0L, 0L)))
    assert(packed((10L, 2)) === ((100L, 0L, 1L)))
    assert(packed((10L, 3)) === ((300L, 1L, 1L)))
    // stream 20 is independent: restarts at 0
    assert(packed((20L, 1)) === ((0L, 0L, 1L)))
    assert(packed((20L, 2)) === ((300L, 1L, 1L)))
  }
}
