package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Retrieval, Similarity}
import graft.ops.{Bucketing, Tombstones}

/** DELETE/tombstone maintenance — the retraction verb of the persisted
  * index lifecycle (ingest → append → stream → DELETE → snapshot →
  * compact): logical deletes hide rows from every probe immediately,
  * compaction drops them PHYSICALLY (asserted against the raw files on
  * disk — the takedown guarantee), replays cannot resurrect them, and
  * for the pure-per-row families `ingest(A∪B); delete(B)` is
  * row-identical to `ingest(A)` at probe time.
  */
class TombstoneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb: DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  private def docs: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def dropAll(tables: String*): Unit =
    tables.foreach(t => Bucketing.dropManaged(spark, t))

  private def tablePath(table: String): String =
    spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).toString

  test("deleteFromLsh: ingest(A∪B); delete(B) probes row-identical to ingest(A)") {
    val tU = "graft_ts_lsh_u"; val tA = "graft_ts_lsh_a"
    val deps = Seq(tU, s"${tU}_meta", s"${tU}_tombstones", tA, s"${tA}_meta")
    dropAll(deps: _*)
    try {
      Similarity.ingestLsh(emb, "vec_id", "embedding", tU,
        nPlanes = 4, nTables = 4, nBuckets = 4)
      Similarity.deleteFromLsh(spark, tU,
        emb.filter(col("vec_id") % 2 =!= 0).select(col("vec_id").as("nn_id")))
      Similarity.ingestLsh(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", tA, nPlanes = 4, nTables = 4, nBuckets = 4)
      val q = emb.filter(col("vec_id") < 10)
      assert(rows(Similarity.topKLshIngested(spark, tU, q, "vec_id", "embedding", k = 5)) ==
        rows(Similarity.topKLshIngested(spark, tA, q, "vec_id", "embedding", k = 5)),
        "deleted index must serve exactly the A-only index's neighbors")
    } finally dropAll(deps: _*)
  }

  test("deleteFromBm25: probe AND stats sidecar equal ingest(A); repeat delete is a no-op") {
    import spark.implicits._
    val tU = "graft_ts_bm25_u"; val tA = "graft_ts_bm25_a"
    val deps = Seq(tU, s"${tU}_dl", s"${tU}_stats", s"${tU}_tombstones",
      tA, s"${tA}_dl", s"${tA}_stats")
    dropAll(deps: _*)
    try {
      Retrieval.ingestBm25(docs, "doc_id", "text", tU, nBuckets = 4)
      val del = docs.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id").as("doc"))
      Retrieval.deleteFromBm25(spark, tU, del)
      // deleting the same ids again must not double-subtract the stats
      Retrieval.deleteFromBm25(spark, tU, del)
      Retrieval.ingestBm25(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", tA, nBuckets = 4)
      assert(rows(spark.table(s"${tU}_stats")) == rows(spark.table(s"${tA}_stats")),
        "stats sidecar must equal the A-only recount exactly")
      val q = Seq((1L, "the quick brown fox"), (2L, "model training data"))
        .toDF("qid", "qtext")
      assert(rows(Retrieval.bm25TopKIngested(spark, tU, q, "qid", "qtext", topK = 5)) ==
        rows(Retrieval.bm25TopKIngested(spark, tA, q, "qid", "qtext", topK = 5)),
        "deleted index must rank exactly like the A-only index")
    } finally dropAll(deps: _*)
  }

  test("compactPq physically drops tombstoned rows: files on disk, probe parity, tombstones cleared") {
    val t = "graft_ts_pq_c"
    val deps = Seq(t, s"${t}_vectors", s"${t}_codebooks", s"${t}_tombstones")
    dropAll(deps: _*)
    try {
      Similarity.ingestPq(emb, "vec_id", "embedding", t,
        m = 4, nCodes = 4, kmeansIters = 1, nBuckets = 4)
      Similarity.deleteFromPq(spark, t,
        emb.filter(col("vec_id") % 3 === 0).select(col("vec_id").as("nn_id")))
      val q = emb.filter(col("vec_id") < 10)
      val before = rows(Similarity.topKPqIngested(spark, t, q,
        "vec_id", "embedding", k = 5, nCandidates = 20))
      // logical delete: rows still in the files, hidden by the anti-join
      assert(spark.read.parquet(tablePath(t))
        .filter(pmod(col("nn_id"), lit(3)) === 0).count() > 0,
        "pre-compaction the deleted rows should still be on disk")
      Similarity.compactPq(spark, t)
      // the takedown guarantee: the raw files contain NO deleted id
      assert(spark.read.parquet(tablePath(t))
        .filter(pmod(col("nn_id"), lit(3)) === 0).count() == 0,
        "compaction must purge deleted ids from the codes files")
      assert(spark.read.parquet(tablePath(s"${t}_vectors"))
        .filter(pmod(col("nn_id"), lit(3)) === 0).count() == 0,
        "compaction must purge deleted ids from the vector files")
      assert(!spark.catalog.tableExists(s"${t}_tombstones"),
        "purge must clear the tombstone set")
      assert(rows(Similarity.topKPqIngested(spark, t, q,
        "vec_id", "embedding", k = 5, nCandidates = 20)) == before,
        "physical drop must not change what probes see")
    } finally dropAll(deps: _*)
  }

  test("purgeStampedRange: physical takedown everywhere, batch-pure files outside the horizon") {
    import graft.ops.Snapshots
    val t = "graft_tomb_range"
    val deps = Seq(t, s"${t}_meta", s"${t}_batches", s"${t}_tombstones")
    dropAll(deps: _*)
    try {
      Similarity.ingestLsh(emb.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", t, nPlanes = 3, nTables = 2, nBuckets = 4)
      Similarity.appendLsh(spark, t, emb.filter(col("vec_id") % 3 === 1),
        "vec_id", "embedding")
      Similarity.appendLsh(spark, t, emb.filter(col("vec_id") % 3 === 2),
        "vec_id", "embedding")
      // victims from the horizon (batch 0) AND the live tail (batch 2):
      // retraction is retroactive, so BOTH must leave the raw files
      Similarity.deleteFromLsh(spark, t,
        emb.filter(col("vec_id").isin(0L, 2L)).select(col("vec_id").as("nn_id")))
      Tombstones.purgeStampedRange(spark, t, Seq(t -> "bucket"), "nn_id",
        bLo = 0L, bHi = 1L)
      val raw = spark.read.parquet(tablePath(t))
      assert(raw.filter(col("nn_id").isin(0L, 2L)).count() == 0L,
        "purged ids must exist in NO file, inside or outside the horizon")
      assert(!spark.catalog.tableExists(s"${t}_tombstones"),
        "tombstone set must clear after the physical drop")
      // the live tail keeps batch-pure files (the pruning the range
      // form exists to preserve)
      val loc = new org.apache.hadoop.fs.Path(tablePath(t))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val perFile = fs.listStatus(loc).map(_.getPath.toString)
        .filter(_.endsWith(".parquet")).toSeq
        .map(f => spark.read.parquet(f).select(col(Snapshots.BatchCol))
          .distinct().collect().map(_.getLong(0)).toSet)
      assert(perFile.forall(s => s == Set(2L) || !s.contains(2L)),
        s"a file mixes the live tail with the horizon: $perFile")
      // snapshots still answer, minus the takedowns
      val at1 = Similarity.topKLshIngested(spark, t,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 3,
        asOf = Some(1L))
      assert(at1.filter(col("nn_id").isin(0L, 2L)).count() == 0L)
      assert(at1.count() > 0L)
    } finally dropAll(deps: _*)
  }

  test("delete-then-replay: a re-delivered batch id cannot resurrect deleted rows") {
    val t = "graft_ts_lsh_replay"
    val deps = Seq(t, s"${t}_meta", s"${t}_commits", s"${t}_tombstones")
    dropAll(deps: _*)
    try {
      val deliver = Similarity.lshSink(t, "vec_id", "embedding",
        nPlanes = 4, nTables = 4, nBuckets = 4)
      deliver(emb.filter(col("vec_id") % 2 === 0), 0L)
      deliver(emb.filter(col("vec_id") % 2 =!= 0), 1L)
      Similarity.deleteFromLsh(spark, t,
        emb.filter(col("vec_id") % 2 =!= 0).select(col("vec_id").as("nn_id")))
      val q = emb.filter(col("vec_id") < 10)
      val afterDelete = rows(Similarity.topKLshIngested(spark, t, q,
        "vec_id", "embedding", k = 5))
      // the at-least-once replay of batch 1: a commit-log no-op — it
      // must neither duplicate rows nor bring the deleted ids back
      deliver(emb.filter(col("vec_id") % 2 =!= 0), 1L)
      assert(rows(Similarity.topKLshIngested(spark, t, q,
        "vec_id", "embedding", k = 5)) == afterDelete,
        "replay after delete must be a no-op")
      // every returned neighbor is an even (live) id
      val nnIds = Similarity.topKLshIngested(spark, t, q,
        "vec_id", "embedding", k = 5)
        .select(col("nn_id").cast("long")).collect().map(_.getLong(0))
      assert(nnIds.nonEmpty && nnIds.forall(_ % 2 == 0),
        s"deleted (odd) ids must never surface: ${nnIds.filter(_ % 2 != 0).take(5).mkString(",")}")
    } finally dropAll(deps: _*)
  }

  test("re-appending a tombstoned id fails LOUDLY (rows would be probe-invisible)") {
    val t = "graft_ts_lsh_guard"
    val deps = Seq(t, s"${t}_meta", s"${t}_tombstones")
    dropAll(deps: _*)
    try {
      Similarity.ingestLsh(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", t, nPlanes = 4, nTables = 4, nBuckets = 4)
      Similarity.deleteFromLsh(spark, t,
        emb.filter(col("vec_id") === 0).select(col("vec_id").as("nn_id")))
      // appending a DIFFERENT batch is still fine
      Similarity.appendLsh(spark, t,
        emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding")
      // re-admitting the deleted id must not silently vanish
      val e = intercept[IllegalArgumentException] {
        Similarity.appendLsh(spark, t,
          emb.filter(col("vec_id") === 0), "vec_id", "embedding")
      }
      assert(e.getMessage.contains("tombstoned"), e.getMessage)
      // after the physical purge the id is re-admittable
      Similarity.compactLsh(spark, t)
      Similarity.appendLsh(spark, t,
        emb.filter(col("vec_id") === 0), "vec_id", "embedding")
      val q = emb.filter(col("vec_id") < 10)
      val nnIds = Similarity.topKLshIngested(spark, t, q,
        "vec_id", "embedding", k = 50)
        .select(col("nn_id").cast("long")).collect().map(_.getLong(0)).toSet
      assert(nnIds.contains(0L), "re-admitted id must be servable after purge")
    } finally dropAll(deps: _*)
  }

  test("ingest rebuild clears a stale tombstone set") {
    val t = "graft_ts_lsh_rebuild"
    val deps = Seq(t, s"${t}_meta", s"${t}_tombstones")
    dropAll(deps: _*)
    try {
      Similarity.ingestLsh(emb, "vec_id", "embedding", t,
        nPlanes = 4, nTables = 4, nBuckets = 4)
      Similarity.deleteFromLsh(spark, t,
        emb.select(col("vec_id").as("nn_id"))) // delete EVERYTHING
      val q = emb.filter(col("vec_id") < 10)
      assert(Similarity.topKLshIngested(spark, t, q,
        "vec_id", "embedding", k = 5).count() == 0,
        "a fully-deleted index serves nothing")
      // rebuild: the stale tombstones must not hide the re-ingested rows
      Similarity.ingestLsh(emb, "vec_id", "embedding", t,
        nPlanes = 4, nTables = 4, nBuckets = 4)
      assert(Similarity.topKLshIngested(spark, t, q,
        "vec_id", "embedding", k = 5).count() > 0,
        "re-ingest must start with no deletes")
    } finally dropAll(deps: _*)
  }

  test("deleteFromMinhashIndex: deleted docs neither candidate nor intersect; flood stays frozen") {
    val t = "graft_ts_mh"
    val deps = Seq(t, s"${t}_shingles", s"${t}_flood", s"${t}_meta",
      s"${t}_tombstones")
    dropAll(deps: _*)
    try {
      val idx = docs.filter(col("doc_id") <= 250)
      Dedup.ingestMinhashIndex(idx, "doc_id", "text", n = 3, k = 8,
        rowsPerBand = 4, maxDocFreq = Some(20), t, nBuckets = 4)
      val batch = docs.filter(col("doc_id") > 250)
      val full = Dedup.minhashLshIngested(spark, t, batch,
        "doc_id", "text", threshold = 0.3)
      val victims = full.select(col("d_old")).distinct()
        .limit(3).collect().map(_.getLong(0))
      assume(victims.nonEmpty, "fixture yields no pairs — cannot exercise delete")
      import spark.implicits._
      Dedup.deleteFromMinhashIndex(spark, t, victims.toSeq.toDF("doc"))
      val after = Dedup.minhashLshIngested(spark, t, batch,
        "doc_id", "text", threshold = 0.3)
      val remaining = after.select(col("d_old").cast("long"))
        .collect().map(_.getLong(0)).toSet
      assert(victims.forall(v => !remaining.contains(v)),
        "deleted docs must not appear as match targets")
    } finally dropAll(deps: _*)
  }
}
