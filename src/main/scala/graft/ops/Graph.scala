package graft.ops

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Num

/** Iterative graph ranking over an edge list — the crawl-prioritization
  * primitive of a large-scale training-data pipeline (domain/host
  * authority from the web link graph, the role harmonic centrality and
  * PageRank play in Common-Crawl-derived corpora).
  *
  * Spark-first shape: the graph is two DataFrames derived from the edge
  * list (out-degrees, node set), and each iteration is one equi-join
  * (edges ⋈ ranks on src) plus one aggregation (sum of contributions by
  * dst) — both plain shuffles Catalyst plans as hash exchanges; the
  * teleport term is pure arithmetic. Ranks are `localCheckpoint`ed per
  * iteration: without truncation the plan doubles in depth every round
  * (the classic iterative-lineage explosion). At 100 TB the lever is
  * storage layout, not the loop: write the edge table bucketed by `src`
  * ([[Bucketing.writeBucketed]]) and the per-iteration edge-side
  * exchange disappears, leaving one rank-sized shuffle per round.
  *
  * Cross-engine determinism: every new rank is rounded to the 1e-6 grid
  * with [[Num.r6]] (the bit-identical floor-based formula the DuckDB
  * oracle uses), so float summation-order noise (~1e-17 relative) cannot
  * accumulate across iterations.
  */
object Graph {

  /** PageRank with fixed iteration count, optionally stopping early on
    * convergence.
    *
    * Multi-edges are weights: a (src, dst) pair appearing k times
    * contributes k shares of src's rank, and k counts toward src's
    * out-degree. Dangling nodes (no out-edges) redistribute their rank
    * mass uniformly; the dangling set is computed ONCE (it is static)
    * and the per-iteration mass aggregation is skipped entirely when the
    * set is empty. The node count enters as one O(1) driver scalar (the
    * teleport constant needs it inside literals), matching the k-means
    * centroid idiom rather than a per-row driver loop.
    *
    * `tol > 0` switches on tolerance-based termination — the standard
    * production control: stop as soon as the L1 rank delta
    * (Σ|rank_i − rank_{i−1}|) drops below `tol`, `iters` becoming the
    * cap. Cost per round: the previous rank rides the iteration's
    * existing relation as one extra column (the contribution join bases
    * on the rank relation instead of the bare node set — value-identical
    * rows, see [[iterate]]) and the delta is ONE 1-row aggregate over
    * the round's materialized ranks — no extra join, no extra shuffle.
    * Choosing tol: the per-iteration 1e-6 grid rounding (the
    * cross-engine determinism contract) floors the reachable delta —
    * the rounded map sometimes has an exact fixed point (delta 0,
    * further iterations bit-identical) but can also settle into a
    * bounded grid-level cycle where delta never drops below a few
    * ×1e-6 (measured: a 5-node star+tail oscillates one grid step on
    * two nodes forever, delta 4e-6). A production tol should therefore
    * sit at or above ~1e-6 × expected-moving-nodes; a smaller tol is
    * safe but may run to the `iters` cap — which is exactly the cap's
    * job. With `tol = 0` (default) the loop and plan are exactly the
    * fixed-count path.
    *
    * @return (node: long, rank: double) — ranks on the 1e-6 grid, sum ≈ 1.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85d, tol: Double = 0.0d): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // deg-attach stays the join form DELIBERATELY (measured this
    // round): a single-pass window rewrite (repartition(P, src) +
    // count over partitionBy(src)) halves the edge-DAG evaluations on
    // paper, but the degree aggregate is |V|-sized and BROADCASTS, so
    // the join form never shuffles e before the keyed checkpoint —
    // where the window pays a full |E| sort+buffer per call. Bench:
    // graph_pagerank 3.25 s → 5.80 s with the window form; reverted.
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    iterate(graft.Partitioning.checkpointKeyed(e.join(deg, "src"), "src"), iters, damping, tol)._1
  }

  /** [[pageRank]] plus the number of iterations actually run — the
    * observable GraphSpec's convergence pins assert against.
    */
  private[graft] def pageRankCounted(edges: DataFrame, srcCol: String, dstCol: String,
                                     iters: Int, damping: Double = 0.85d,
                                     tol: Double = 0.0d): (DataFrame, Int) = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    iterate(graft.Partitioning.checkpointKeyed(e.join(deg, "src"), "src"), iters, damping, tol)
  }

  /** Write the degree-annotated edge relation `(src, dst, deg)` as a
    * parquet table bucketed by `src` — the pay-once-at-ingest layout
    * that removes the edge-side exchange from EVERY
    * [[pageRankBucketed]] iteration (only the rank relation shuffles
    * per round). The degree is baked in at write time: recomputing it
    * per run would re-shuffle the edges the bucketing exists to avoid.
    */
  def writeEdges(edges: DataFrame, srcCol: String, dstCol: String,
                 table: String, nBuckets: Int): Unit = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    Bucketing.writeBucketed(e.join(deg, "src"), table, "src", nBuckets)
  }

  /** Incremental edge ingest — the crawl-frontier twin of [[writeEdges]],
    * callable per micro-batch from a Structured Streaming
    * `foreachBatch` sink (StreamingSpec proves stream-vs-batch rank
    * equality).
    *
    * Layout: an APPEND-ONLY edge log `logTable` (src, dst) bucketed by
    * src, plus a DERIVED degree table `degTable` (src, deg) bucketed
    * the same way. Each batch appends its edges (history is never
    * rewritten — the property that makes the sink streamable and the
    * log safe to re-read mid-ingest) and rebuilds the degree relation:
    * a groupBy(src) over the src-bucketed log, which Catalyst plans
    * WITHOUT an exchange, writing |V| rows. [[writeEdges]]'s
    * baked-in-deg layout is the right call for write-once graphs, but
    * under ingest it would rewrite every stored row of every src the
    * batch touches — O(affected-src edges) rewrite per batch versus
    * this layout's O(|V|) derived-table refresh.
    */
  def ingestEdges(edges: DataFrame, srcCol: String, dstCol: String,
                  logTable: String, degTable: String, nBuckets: Int): Unit = {
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    if (spark.catalog.tableExists(logTable))
      Bucketing.appendBucketed(e, logTable, "src", nBuckets)
    else
      Bucketing.writeBucketed(e, logTable, "src", nBuckets)
    val deg = spark.table(logTable).groupBy("src")
      .agg(count(lit(1)).cast("double").as("deg"))
    // cluster = false: the aggregation over the src-bucketed log scan
    // is already one-partition-per-bucket — re-clustering would add a
    // redundant exchange for a layout the rows already have
    Bucketing.writeBucketed(deg, degTable, "src", nBuckets, cluster = false)
  }

  /** PageRank over an [[ingestEdges]] log: the log⋈degrees join is
    * co-located (both tables bucketed by src, same count — zero
    * exchanges, StreamingSpec asserts it), so like [[pageRankBucketed]]
    * only the rank relation shuffles per iteration. Bit-identical to
    * [[pageRank]] over the concatenation of every ingested batch.
    */
  def pageRankIngested(spark: SparkSession, logTable: String, degTable: String,
                       iters: Int, damping: Double = 0.85d,
                       tol: Double = 0.0d): DataFrame =
    iterate(spark.table(logTable).join(spark.table(degTable), "src"),
      iters, damping, tol,
      keyParts = Some(Bucketing.bucketCountOf(spark, logTable)))._1

  /** PageRank over a [[writeEdges]]-bucketed edge table: bit-identical
    * output to [[pageRank]] on the same edges (same arithmetic, same
    * per-iteration rounding), but each iteration's edges⋈ranks join
    * reads the bucketed scan directly — Catalyst plans the exchange on
    * the rank side only, which at 100 TB is |V| rows per round instead
    * of |E|.
    */
  def pageRankBucketed(spark: SparkSession, edgeTable: String,
                       iters: Int, damping: Double = 0.85d,
                       tol: Double = 0.0d): DataFrame =
    iterate(spark.table(edgeTable), iters, damping, tol,
      keyParts = Some(Bucketing.bucketCountOf(spark, edgeTable)))._1

  /** Weighted PageRank: each out-edge carries a weight and src's rank
    * splits PROPORTIONALLY to weight instead of uniformly — the
    * link-graph curation semantics where link prominence matters
    * (anchor count, click share, co-purchase volume). Contribution of
    * edge (s→t, w) is rank(s)·w/W(s) with W(s) = Σ out-weights of s.
    *
    * Exactness discipline: weights are converted ONCE to integer
    * micro-units (floor(w·1e6+0.5), the repo-wide grid) so the
    * per-source weight total is an EXACT integer sum — aggregation
    * order can never move it — and the per-edge share wµ/Wµ is then
    * one double division both engines reproduce bit-identically.
    * Edges with null or non-positive weight are DROPPED: a zero-weight
    * edge carries no rank mass, and a source left without positive
    * out-edges becomes dangling (its mass redistributes) — the
    * documented semantics, mirrored by the oracle's WHERE wµ > 0.
    * Everything else — teleport, dangling handling, per-iteration r6
    * rounding, tol-based termination, lineage truncation — is the
    * shared [[pageRank]] loop ([[iterate]] with a weighted
    * contribution); with every weight equal the share wµ/Wµ equals
    * 1/deg up to one rounding (GraphSpec asserts rank equality with
    * [[pageRank]] on the r6 grid). The same storage lever applies at
    * 100 TB: persist (src, dst, wµ, Wµ) bucketed by src
    * ([[writeEdges]]'s baked-in-degree pattern) and the per-iteration
    * edge-side exchange disappears.
    *
    * @return (node: long, rank: double) — ranks on the 1e-6 grid
    */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, iters: Int, damping: Double = 0.85d,
                       tol: Double = 0.0d): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        floor(col(wCol).cast("double") * lit(1000000.0d) + lit(0.5d))
          .cast("long").as("wmu"))
      .where(col("wmu") > 0L)
    val deg = e.groupBy("src").agg(sum(col("wmu")).as("degmu"))
    iterate(graft.Partitioning.checkpointKeyed(e.join(deg, "src"), "src"),
      iters, damping, tol,
      contrib = col("rank") * col("wmu").cast("double")
        / col("degmu").cast("double"))._1
  }

  /** [[writeEdges]] for the WEIGHTED family: the micro-unit weighted
    * edge relation `(src, dst, wmu, degmu)` bucketed by src, weight
    * totals baked in at write time. Weights are validated ONCE here —
    * nulls and non-positive weights dropped (the [[pageRankWeighted]]
    * semantics), negativity rejected loudly — so the per-run probes
    * ([[pageRankWeightedBucketed]], [[ssspBucketed]]) read a
    * trusted-by-construction table and never re-scan to validate.
    * Provenance is recorded in a 1-row `(wmu_scale, validated)` sidecar
    * (the ingestLsh parameter-sidecar pattern): the probes verify it
    * before trusting the table, so pointing them at a table NOT written
    * here — different micro-unit scale, unvalidated negative weights
    * that would break sssp's w ≥ 0 precondition — fails loudly instead
    * of silently yielding wrong distances/ranks.
    */
  def writeWeightedEdges(edges: DataFrame, srcCol: String, dstCol: String,
                         wCol: String, table: String, nBuckets: Int): Unit = {
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      floor(col(wCol).cast("double") * lit(1000000.0d) + lit(0.5d))
        .cast("long").as("wmu"))
    require(e0.where(col("wmu") < 0L).limit(1).count() == 0L,
      "writeWeightedEdges requires non-negative edge weights")
    val e = e0.where(col("wmu") > 0L)
    val deg = e.groupBy("src").agg(sum(col("wmu")).as("degmu"))
    Bucketing.writeBucketed(e.join(deg, "src"), table, "src", nBuckets)
    val spark = edges.sparkSession
    import spark.implicits._
    Bucketing.writeSmall(
      Seq((1000000L, true)).toDF("wmu_scale", "validated"), s"${table}_meta")
  }

  /** [[ingestEdges]] for the WEIGHTED family — the append path
    * [[writeWeightedEdges]] (a full rebuild) cannot offer, because its
    * baked-in `degmu` totals go stale the moment an existing source
    * gains an edge. The log layout splits the concerns exactly like
    * the unweighted twin: the `(src, dst, wmu)` edge log APPENDS
    * batch-sized (validated per batch — negatives rejected loudly,
    * non-positives dropped, the [[pageRankWeighted]] semantics), and
    * the `(src, degmu)` weight-total table REBUILDS from the log via
    * an exchange-free bucketed groupBy (both tables bucketed by src,
    * same count — the probes' log⋈degrees join co-locates). The
    * provenance sidecar rides on the LOG table so the probes'
    * [[requireWeightedTable]] guard covers the pair.
    */
  def ingestWeightedEdges(edges: DataFrame, srcCol: String, dstCol: String,
                          wCol: String, logTable: String, degTable: String,
                          nBuckets: Int): Unit = {
    val spark = edges.sparkSession
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      floor(col(wCol).cast("double") * lit(1000000.0d) + lit(0.5d))
        .cast("long").as("wmu"))
    require(e0.where(col("wmu") < 0L).limit(1).count() == 0L,
      "ingestWeightedEdges requires non-negative edge weights")
    val e = e0.where(col("wmu") > 0L)
    // append with the CATALOG's bucket count, not the caller's — a
    // config drift between the bootstrap and incremental jobs must be
    // impossible by construction (the appendBm25/appendIvf discipline)
    if (spark.catalog.tableExists(logTable))
      Bucketing.appendBucketed(e, logTable, "src",
        Bucketing.bucketCountOf(spark, logTable))
    else Bucketing.writeBucketed(e, logTable, "src", nBuckets)
    // degTable MUST share the log's bucket count or the co-located
    // log⋈degrees join stops being exchange-free
    Bucketing.writeBucketed(
      spark.table(logTable).groupBy("src").agg(sum(col("wmu")).as("degmu")),
      degTable, "src", Bucketing.bucketCountOf(spark, logTable))
    import spark.implicits._
    Bucketing.writeSmall(
      Seq((1000000L, true)).toDF("wmu_scale", "validated"),
      s"${logTable}_meta")
  }

  /** [[pageRankWeighted]] over an [[ingestWeightedEdges]] log:
    * bit-identical ranks to the batch operator on the concatenation of
    * every ingested batch (weight merging is a SUM — batch boundaries
    * cannot move it); the log⋈degrees join co-locates bucket-wise, so
    * per round only the rank relation shuffles.
    */
  def pageRankWeightedIngested(spark: SparkSession, logTable: String,
                               degTable: String, iters: Int,
                               damping: Double = 0.85d,
                               tol: Double = 0.0d): DataFrame = {
    requireWeightedTable(spark, logTable)
    iterate(spark.table(logTable).join(spark.table(degTable), "src"),
      iters, damping, tol,
      contrib = col("rank") * col("wmu").cast("double")
        / col("degmu").cast("double"),
      keyParts = Some(Bucketing.bucketCountOf(spark, logTable)))._1
  }

  /** [[sssp]] over an [[ingestWeightedEdges]] log — shortest paths need
    * no degree totals, so the probe reads the src-bucketed log alone;
    * relaxation rounds are exchange-free on the edge side exactly like
    * [[ssspBucketed]].
    */
  def ssspIngested(spark: SparkSession, logTable: String,
                   sources: DataFrame, sourceCol: String,
                   maxIters: Int): DataFrame = {
    requireWeightedTable(spark, logTable)
    ssspLoop(spark.table(logTable).select(col("src"), col("dst"), col("wmu")),
      sources, sourceCol, maxIters)
  }

  /** Verify a table was written by [[writeWeightedEdges]] (sidecar
    * present, expected scale, validated flag) before a bucketed probe
    * trusts its unchecked preconditions. 1-row read, bounded.
    */
  private def requireWeightedTable(spark: SparkSession, table: String): Unit = {
    val ok =
      try {
        val m = spark.table(s"${table}_meta").first()
        m.getLong(m.fieldIndex("wmu_scale")) == 1000000L &&
          m.getBoolean(m.fieldIndex("validated"))
      } catch { case _: Exception => false }
    require(ok, s"table '$table' was not written by writeWeightedEdges " +
      s"(missing or mismatched ${table}_meta sidecar); the bucketed probes " +
      "rely on its at-ingest weight validation and micro-unit scale")
  }

  /** [[pageRankWeighted]] over a [[writeWeightedEdges]] table:
    * bit-identical ranks, but each iteration's edges⋈ranks join reads
    * the src-bucketed scan exchange-free — only the rank relation
    * (|V| rows) shuffles per round, the [[pageRankBucketed]] property
    * SCALING.md measures (the plain loop's per-iteration edge
    * exchange+sort is the one superlinear term in the curve).
    */
  def pageRankWeightedBucketed(spark: SparkSession, table: String,
                               iters: Int, damping: Double = 0.85d,
                               tol: Double = 0.0d): DataFrame = {
    requireWeightedTable(spark, table)
    iterate(spark.table(table), iters, damping, tol,
      contrib = col("rank") * col("wmu").cast("double")
        / col("degmu").cast("double"),
      keyParts = Some(Bucketing.bucketCountOf(spark, table)))._1
  }

  /** Personalized PageRank (PPR): rank mass teleports to a SEED SET
    * instead of uniformly — "authority relative to these trusted
    * hosts", the crawl-prioritization and related-entity primitive
    * standard PageRank cannot express (its ranking is global). Seeds
    * need not appear in the edge list (isolated seeds are dangling
    * nodes and their mass re-teleports to the seed set, the standard
    * PPR convention); nodes outside every seed's reach legitimately
    * rank 0.
    *
    * Same Spark shape as [[pageRank]]: per iteration one equi-join +
    * one aggregation, dangling mass as a 1-row broadcast scalar,
    * lineage truncated, every rank on the r6 grid. The update is
    * written as `seedTp + d·(insum + seedDm)` — EXACTLY the standard
    * formula's association — so PPR with seeds = all nodes is
    * bit-identical to [[pageRank]] (GraphSpec asserts it, dangling
    * case included).
    *
    * @return (node: long, rank: double) — every node of edges ∪ seeds
    */
  def pageRankPersonalized(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iters: Int, damping: Double = 0.85d): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    require(damping > 0.0d && damping < 1.0d, "damping must be in (0, 1)")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    val eDeg = graft.Partitioning.checkpointKeyed(e.join(deg, "src"), "src")
    val sd = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .pipe(graft.Partitioning.checkpointKeep)
    val nS = sd.count()
    // no seeds → nothing to personalize toward: empty ranking, the
    // same graceful empty-input contract as pageRank on empty edges
    if (nS == 0L) return sd.withColumn("rank", lit(0.0d))
    val nSD = nS.toDouble
    val nodes = eDeg.select(col("src").as("node"))
      .union(eDeg.select(col("dst").as("node")))
      .union(sd.select(col("node")))
      .distinct()
      .join(sd.select(col("node"), lit(true).as("__s")), Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(false)).as("seed"))
      .pipe(graft.Partitioning.checkpointKeyed(_, "node"))
    val danglingNodes = nodes
      .join(eDeg.select(col("src").as("node")), Seq("node"), "left_anti")
      .pipe(graft.Partitioning.checkpointKeep)
    val hasDangling = danglingNodes.limit(1).count() > 0L
    val tp = (1.0d - damping) / nSD
    var ranks = nodes.select(col("node"), col("seed"),
      when(col("seed"), lit(1.0d / nSD)).otherwise(lit(0.0d)).as("rank"))
    var i = 0
    while (i < iters) {
      val contribs = eDeg
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("insum"))
        .select(col("dst").as("node"), col("insum"))
      val base = nodes.join(contribs, Seq("node"), "left")
      val withDm =
        if (hasDangling) {
          val dm = ranks.join(danglingNodes, Seq("node"), "left_semi")
            .agg(coalesce(sum("rank"), lit(0.0d)).as("dm"))
          base.crossJoin(broadcast(dm))
        } else base.withColumn("dm", lit(0.0d))
      val newRank = Num.r6(
        when(col("seed"), lit(tp)).otherwise(lit(0.0d)) +
          lit(damping) * (coalesce(col("insum"), lit(0.0d)) +
            when(col("seed"), col("dm") / lit(nSD)).otherwise(lit(0.0d))))
      ranks = withDm.select(col("node"), col("seed"), newRank.as("rank"))
      i += 1
      if (i < iters) ranks = ranks.pipe(graft.Partitioning.checkpointKeep)
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Synchronous label propagation (community detection): every node
    * starts labeled with its own id; each iteration a node adopts the
    * most frequent label among its in-neighbors, ties broken to the
    * SMALLEST label, nodes with no in-edges keeping their label —
    * fully deterministic (the classic async LPA is order-dependent;
    * the sync+min-tie variant is reproducible run to run and across
    * engines, all-integer arithmetic). Pass both edge directions for
    * undirected semantics. Per iteration: one join on src + two
    * aggregations (label counts, then per-node argmax as
    * `max(struct(cnt, -label))` — max count, tie min label), the same
    * shuffle shape as [[pageRank]]; lineage is truncated between
    * iterations the same way. Communities of the dedup graph
    * ([[graft.llm.Dedup.connectedComponents]] finds the exact
    * components) differ in that LPA splits weakly-connected hubs —
    * the crawl-corpus use is grouping hosts into topical clusters.
    *
    * @return (node: long, label: long)
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    val e = graft.Partitioning.checkpointKeyed(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")), "src")
    var labels = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .select(col("node"), col("node").as("label"))
    var i = 0
    while (i < iters) {
      val vote = e.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("dst").as("node"), (-col("m.nl")).as("new_label"))
      labels = labels.join(vote, Seq("node"), "left")
        .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
      i += 1
      if (i < iters) labels = labels.pipe(graft.Partitioning.checkpointKeep)
    }
    labels
  }

  /** Shared iteration loop over a degree-annotated edge relation
    * `(src, dst, deg)`. Returns (ranks, iterations actually run).
    *
    * With `tol > 0` the contribution join bases on the RANK relation
    * (node, rank) instead of the bare node set — the same rows by
    * construction (ranks are defined over exactly the node set every
    * round), so the arithmetic and output are bit-identical to the
    * fixed-count path; the previous rank simply rides along as the
    * `prev` column, and the round's L1 delta is one 1-row aggregate
    * over the checkpointed result. The loop stops when delta < tol.
    */
  private def iterate(eDeg: DataFrame, iters: Int, damping: Double,
                      tol: Double = 0.0d,
                      contrib: Column = col("rank") / col("deg"),
                      keyParts: Option[Int] = None): (DataFrame, Int) = {
    require(iters >= 1, "iters must be at least 1")
    require(damping > 0.0d && damping < 1.0d, "damping must be in (0, 1)")
    require(tol >= 0.0d, "tol must be non-negative")
    // keyed at the session's shuffle-partition count: every iteration
    // LEFT-joins nodes on `node` against the contribution aggregate —
    // a keyed claim pins the join (and therefore each round's OUTPUT)
    // at plain hash(node, P), which the next round's rank-side join
    // reuses through the node->src alias (zero rank-side exchange)
    // keyParts aligns the node/rank keying with a BUCKETED edge
    // relation's bucket count so the co-location cascade below holds
    // for the bucketed/ingested twins too (a mismatched count would
    // re-exchange the rank side to the bucket count every round)
    val nodes = graft.Partitioning.checkpointKeyed(
      eDeg.select(col("src").as("node"))
        .union(eDeg.select(col("dst").as("node")))
        .distinct(), "node", keyParts)
    val n = nodes.count()
    if (n == 0L) return (nodes.withColumn("rank", lit(0.0d)), 0)

    val danglingNodes = nodes
      .join(eDeg.select(col("src").as("node")), Seq("node"), "left_anti")
      .pipe(graft.Partitioning.checkpointKeep)
    val hasDangling = danglingNodes.limit(1).count() > 0L

    val nD = n.toDouble
    val teleport = (1.0d - damping) / nD
    var ranks = nodes.select(col("node"), lit(1.0d / nD).as("rank"))
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(contrib).as("insum"))
        .select(col("dst").as("node"), col("insum"))
      // tol mode carries the previous rank through the SAME join (ranks
      // covers exactly the node set, so the row set is identical)
      val base =
        if (tol > 0.0d) ranks.withColumnRenamed("rank", "prev")
          .join(contribs, Seq("node"), "left")
        else nodes.join(contribs, Seq("node"), "left")
      val withDm =
        if (hasDangling) {
          // 1-row scalar broadcast, the tpch_q15 idiom — never a shuffle
          val dm = ranks.join(danglingNodes, Seq("node"), "left_semi")
            .agg(coalesce(sum("rank"), lit(0.0d)).as("dm"))
          base.crossJoin(broadcast(dm))
        } else base.withColumn("dm", lit(0.0d))
      val newRank = Num.r6(lit(teleport) + lit(damping) *
        (coalesce(col("insum"), lit(0.0d)) + col("dm") / lit(nD)))
      i += 1
      if (tol > 0.0d) {
        val next = withDm.select(col("node"), col("prev"), newRank.as("rank"))
          .pipe(graft.Partitioning.checkpointKeep)
        val delta = next.agg(coalesce(sum(abs(col("rank") - col("prev"))),
          lit(0.0d))).first().getDouble(0)
        converged = delta < tol
        ranks = next.select(col("node"), col("rank"))
      } else {
        ranks = withDm.select(col("node"), newRank.as("rank"))
        // truncate lineage between iterations; the LAST iteration stays
        // lazy so the caller's sink job is the one that materializes it
        // (and its plan stays inspectable)
        if (i < iters) ranks = ranks.pipe(graft.Partitioning.checkpointKeep)
      }
    }
    (ranks, i)
  }

  /** Bounded-hop breadth-first distances from a set of source nodes —
    * the reachability primitive (crawl-frontier expansion, link-distance
    * features, "within k clicks of a seed domain" corpus selection).
    *
    * Spark-first shape: level-synchronous BFS. The state is one
    * DataFrame (node, dist) holding every node reached so far; each hop
    * expands the CURRENT FRONTIER (nodes first reached last round) along
    * the edge list — one equi-join on src — then folds the expansion in
    * with a min-distance aggregate. Joining only the frontier, not the
    * full reached set, keeps hop cost proportional to the frontier's
    * out-edges; state is |V|-bounded by construction (min per node), so
    * unlike path-enumeration formulations nothing explodes on cyclic
    * graphs. Lineage is truncated per hop like [[pageRank]].
    *
    * At 100 TB the same layout lever applies: over a src-bucketed edge
    * table the per-hop edge-side exchange disappears and only the
    * frontier (≤|V| rows) shuffles — that twin is [[bfsBucketed]]
    * (GraphSpec asserts its strictly-fewer-exchanges plan).
    *
    * Directed semantics; pass both directions for undirected. Source
    * nodes need not appear in the edge list (isolated sources report
    * dist 0). The hop loop stops early when a round reaches no new node.
    *
    * @return (node: long, dist: int) — only reached nodes, dist ≤ maxHops
    */
  def bfs(edges: DataFrame, srcCol: String, dstCol: String,
          sources: DataFrame, sourceCol: String, maxHops: Int): DataFrame = {
    val e = graft.Partitioning.checkpointKeyed(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")), "src")
    bfsLoop(e, sources, sourceCol, maxHops)
  }

  /** [[bfs]] over a [[writeEdges]]-bucketed (or [[ingestEdges]]-logged)
    * edge table: bit-identical distances, but each hop's edges⋈frontier
    * join reads the src-bucketed scan directly — no per-hop edge-side
    * exchange, only the frontier (≤|V| rows) shuffles. The edge
    * relation is NOT checkpointed here: truncating it would discard
    * exactly the bucketed output partitioning this twin exists to
    * exploit (the per-hop state still checkpoints, as in [[bfs]]).
    */
  def bfsBucketed(spark: SparkSession, edgeTable: String,
                  sources: DataFrame, sourceCol: String, maxHops: Int): DataFrame =
    bfsLoop(spark.table(edgeTable).select(col("src"), col("dst")),
      sources, sourceCol, maxHops)

  private def bfsLoop(e: DataFrame, sources: DataFrame, sourceCol: String,
                      maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    var reached = sources.select(col(sourceCol).cast("long").as("node")).distinct()
      .select(col("node"), lit(0).as("dist")).pipe(graft.Partitioning.checkpointKeep)
    var frontier = reached
    var hop = 0
    while (hop < maxHops && frontier.limit(1).count() > 0L) {
      hop += 1
      val expand = e.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), lit(hop).as("dist"))
      val next = reached.union(expand)
        .groupBy("node").agg(min(col("dist")).as("dist"))
      if (hop < maxHops) {
        // ONE checkpoint per hop: the frontier is a filter over the
        // checkpointed state, not a second materialization
        val ck = next.pipe(graft.Partitioning.checkpointKeep)
        frontier = ck.where(col("dist") === hop)
        reached = ck
      } else {
        // the LAST hop stays lazy (the pageRank discipline): the
        // caller's sink job materializes it and the hop-join plan —
        // including the bucketed twin's exchange-free edge side —
        // stays inspectable
        reached = next
      }
    }
    reached
  }

  /** Single-source shortest path over NON-NEGATIVE edge weights —
    * [[bfs]]'s weighted twin (link-distance features where hop count is
    * too coarse: latency-weighted crawl distance, cost-weighted
    * reachability). Frontier-based Bellman–Ford relaxation: the state
    * is (node, distµ) min-distance in EXACT integer micro-units (the
    * [[pageRankWeighted]] grid — weights floor(w·1e6+0.5), so every
    * path length is an exact long and min() is order-independent);
    * each round expands only the nodes whose distance IMPROVED last
    * round along the edge list (one equi-join on src), folds with a
    * min aggregate, and derives the next frontier from the
    * improvement join. State is |V|-bounded by construction; rounds
    * stop early at the fixpoint (no improvement), `maxIters` capping
    * — the oracle's full unroll is identical because converged rounds
    * are no-ops under min (the [[kCore]] argument). Negative weights
    * are REJECTED loudly (one cheap limit-1 probe): with the early
    * exit this frontier loop is Dijkstra-correct only for w ≥ 0, and
    * a negative cycle would never converge. Null-weight edges drop
    * (no defined length). The bucketed-edge layout lever applies
    * unchanged: over a src-bucketed table the per-round edge-side
    * exchange disappears ([[bfsBucketed]]'s shape).
    *
    * Directed semantics; pass both directions for undirected. Isolated
    * sources report dist 0; unreached nodes are absent. The last
    * round stays lazy (the [[bfs]] discipline).
    *
    * @return (node: long, dist: double) — micro-exact lengths on the
    *         1e-6 grid, dist ≤ shortest reachable within maxIters hops
    */
  def sssp(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
           sources: DataFrame, sourceCol: String, maxIters: Int): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        floor(col(wCol).cast("double") * lit(1000000.0d) + lit(0.5d))
          .cast("long").as("wmu"))
      .where(col("wmu").isNotNull)
      .pipe(graft.Partitioning.checkpointKeyed(_, "src"))
    require(e.where(col("wmu") < 0L).limit(1).count() == 0L,
      "sssp requires non-negative edge weights")
    ssspLoop(e, sources, sourceCol, maxIters)
  }

  /** [[sssp]] over a [[writeWeightedEdges]]-bucketed table: identical
    * distances, but each relaxation round's edges⋈frontier join reads
    * the src-bucketed scan exchange-free — only the frontier (≤|V|
    * rows) shuffles, the [[bfsBucketed]] shape. The edge relation is
    * NOT checkpointed (truncation would discard the bucketing) and not
    * re-validated: the write rejected negative weights once at ingest
    * (provenance verified via the `_meta` sidecar — a foreign table
    * with unvalidated weights would violate the w ≥ 0 precondition
    * silently).
    */
  def ssspBucketed(spark: SparkSession, edgeTable: String,
                   sources: DataFrame, sourceCol: String,
                   maxIters: Int): DataFrame = {
    requireWeightedTable(spark, edgeTable)
    ssspLoop(spark.table(edgeTable).select(col("src"), col("dst"), col("wmu")),
      sources, sourceCol, maxIters)
  }

  private def ssspLoop(e: DataFrame, sources: DataFrame, sourceCol: String,
                       maxIters: Int): DataFrame = {
    require(maxIters >= 0, "maxIters must be non-negative")
    var reached = sources.select(col(sourceCol).cast("long").as("node")).distinct()
      .select(col("node"), lit(0L).as("distmu")).pipe(graft.Partitioning.checkpointKeep)
    var frontier = reached
    var it = 0
    var result = reached
    while (it < maxIters && frontier.limit(1).count() > 0L) {
      it += 1
      val expand = e.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("distmu") + col("wmu")).as("distmu"))
      val next = reached.union(expand)
        .groupBy("node").agg(min(col("distmu")).as("distmu"))
      if (it < maxIters) {
        val ck = next.pipe(graft.Partitioning.checkpointKeep)
        // frontier = nodes whose best distance improved (or are new):
        // only they can improve a neighbor next round
        frontier = ck.join(
            reached.withColumnRenamed("distmu", "prevmu"), Seq("node"), "left")
          .where(col("prevmu").isNull || col("distmu") < col("prevmu"))
          .select(col("node"), col("distmu"))
        reached = ck
        result = ck
      } else {
        result = next // last round lazy: caller's sink materializes it
      }
    }
    result.select(col("node"),
      Num.r6(col("distmu").cast("double") / lit(1000000.0d)).as("dist"))
  }

  /** Triangle enumeration over an undirected edge list — the cohesion
    * primitive (dup-cluster density, community quality, spam-farm
    * detection on a link graph).
    *
    * Algorithm: degree orientation ("compact-forward"). Each undirected
    * edge is oriented from its (degree, id)-smaller endpoint to the
    * larger, which bounds every node's OUT-degree by O(√|E|) no matter
    * how skewed the in-degrees are — the hub that touches a million
    * edges contributes wedges only through its ≤√E higher-ranked
    * neighbors, so the wedge join cannot explode on power-law graphs
    * (the failure mode of the naive a⋈b⋈c self-join at 100 TB). Both
    * wedge sides and the closing probe are plain equi-joins Catalyst
    * shuffles on node keys.
    *
    * Input may contain duplicates, self-loops, or both directions; it is
    * normalized to distinct undirected pairs first. Output is one row
    * per triangle with ids sorted ascending — a deterministic set (the
    * orientation affects only the work distribution, never the result).
    *
    * @return (d1, d2, d3) with d1 < d2 < d3
    */
  def triangles(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val p = pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = p.select(col("u").as("n")).union(p.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient by (deg, id); carry the HEAD's rank so the wedge join can
    // order the two out-neighbors without re-joining degrees
    val or = p
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"), col("du").as("dt"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
    // wedges s→x, s→y with rank(x) < rank(y); the closing edge, if it
    // exists, is oriented exactly x→y (orientation is the same total
    // order), so ONE equi-join probe closes the triangle
    val e1 = or.select(col("s"), col("t").as("x"), col("dt").as("dx"))
    val e2 = or.select(col("s"), col("t").as("y"), col("dt").as("dy"))
    val wedges = e1.join(e2, "s")
      .where(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
    val closed = wedges.join(or.select(col("s").as("x"), col("t").as("y")),
      Seq("x", "y"))
    closed.select(array_sort(array(col("s"), col("x"), col("y"))).as("tri"))
      .select(col("tri")(0).as("d1"), col("tri")(1).as("d2"), col("tri")(2).as("d3"))
  }

  /** k-core peeling over an undirected graph: repeatedly remove nodes
    * of degree < k (and their incident edges) — the cohesive-subgraph
    * primitive (spam-farm cores, dense community seeds, the "remove
    * the stragglers" cleanup before expensive per-edge analytics).
    *
    * Spark-first shape: each round is one degree aggregation plus two
    * LEFT SEMI joins (edges whose BOTH endpoints survive) — plain
    * key shuffles, no windows; the edge relation only ever SHRINKS, so
    * round cost is monotonically decreasing; lineage truncates per
    * round like every iterative operator here. `rounds` is a FIXED
    * count, not a fixpoint test: cross-engine determinism requires the
    * oracle to unroll the identical number of rounds, and a converged
    * peel is simply one whose result is stable under +1 round
    * (GraphSpec asserts that for the gate's configuration — peeling
    * converges in O(diameter-ish) rounds on real graphs, and each
    * no-op round costs one shrunken-relation pass).
    *
    * @return (node, deg) — surviving nodes with their in-core degree
    */
  def kCore(pairs: DataFrame, aCol: String, bCol: String,
            k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(rounds >= 1, "rounds must be at least 1")
    var p = pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .pipe(graft.Partitioning.checkpointKeep)
    var r = 0
    while (r < rounds) {
      val keep = p.select(col("u").as("n")).union(p.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
        .where(col("d") >= k)
        .select(col("n"))
      p = p.join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
      r += 1
      if (r < rounds) {
        p = p.pipe(graft.Partitioning.checkpointKeep)
        // an empty relation is a fixpoint — the remaining rounds are
        // no-ops by construction, so skipping them cannot diverge from
        // the oracle's full unroll
        if (p.limit(1).count() == 0L) r = rounds
      }
    }
    // degrees of the final edge relation, NO extra >= k filter: that
    // would be half of round rounds+1 — convergence (stability under
    // +1 round) is asserted in GraphSpec, not silently patched here
    p.select(col("u").as("node")).union(p.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /** Link prediction over an undirected graph: score every NON-edge
    * (x, y) that shares at least one neighbor by common-neighbor count
    * and Adamic–Adar (Σ 1/ln(deg w) over the shared neighbors w — rare
    * shared neighbors weigh more), the classic "related hosts/users you
    * haven't linked yet" primitive.
    *
    * Scale shape: candidate pairs are generated ONLY through shared
    * neighbors — one self-join of the adjacency list on the middle node
    * — so the work is Σ deg(w)², never |V|². That sum is exactly where
    * power-law graphs explode, so `maxDeg` caps the wedge middle: a hub
    * above the cap generates no candidates through itself (the standard
    * flood-cap discipline this engine applies to every pair generator —
    * shingle docFreq, LSH buckets; hubs carry little signal in AA
    * anyway, 1/ln(deg) → 0). NOTE the cap is therefore part of the
    * METRIC, not just candidate generation: both `cn` and `aa` count
    * only shared neighbors with deg ≤ maxDeg — a pair whose common
    * neighbors include a hub reports the capped count, not the true
    * common-neighbor count (the DuckDB oracle computes the identical
    * filtered metric). Callers needing the exact CN of surviving
    * candidate pairs can re-score them against the full adjacency list.
    * Existing edges are anti-joined out at the end. The AA sum is
    * float; scores are r6-rounded on the 1e-6 grid (the [[pageRank]]
    * discipline — summation-order noise is ~1e-16 relative, ten orders
    * below the grid).
    *
    * @return (u, v, cn: long, aa: double) with u < v, non-edges only;
    *         cn/aa computed over the deg ≤ maxDeg middle set
    */
  def linkPrediction(pairs: DataFrame, aCol: String, bCol: String,
                     maxDeg: Int): DataFrame = {
    require(maxDeg >= 2, "maxDeg must be at least 2 (a wedge middle has degree >= 2)")
    val p = pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .pipe(graft.Partitioning.checkpointKeep)
    val deg = p.select(col("u").as("n")).union(p.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val adj = p.select(col("u").as("w"), col("v").as("x"))
      .union(p.select(col("v").as("w"), col("u").as("x")))
    // wedge middles capped at maxDeg; 1/ln(d) rides along from one join
    val mid = adj.join(deg.where(col("d") <= maxDeg)
      .select(col("n").as("w"), col("d")), "w")
    val wedges = mid.select(col("w"), col("x"), col("d"))
      .join(mid.select(col("w"), col("x").as("y")), "w")
      .where(col("x") < col("y"))
    wedges.groupBy(col("x").as("u"), col("y").as("v"))
      .agg(count(lit(1)).as("cn"),
        graft.Num.r6(sum(lit(1.0d) / log(col("d").cast("double")))).as("aa"))
      .join(p, Seq("u", "v"), "left_anti")
  }

  /** Per-node triangle count and local clustering coefficient
    * cc = 2·tri / (deg·(deg−1)) over the same normalized undirected
    * graph ([[triangles]] provides the enumeration; nodes of degree < 2
    * or with no triangles report 0). r6-rounded, the cross-engine grid.
    *
    * @return (node, deg, tri, cc)
    */
  def clusteringCoefficient(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val p = pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = p.select(col("u").as("node")).union(p.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val tris = triangles(pairs, aCol, bCol)
    val perNode = tris.select(explode(array(col("d1"), col("d2"), col("d3"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"), coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("deg") >= 2, Num.r6(lit(2.0d) * coalesce(col("tri"), lit(0L)).cast("double") /
          (col("deg") * (col("deg") - 1)).cast("double"))).otherwise(lit(0.0d)).as("cc"))
  }
}
