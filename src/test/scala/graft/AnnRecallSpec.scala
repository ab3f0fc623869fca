package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** Retrieval-QUALITY harness for the approximate similarity paths: the
  * LSH and IVF top-k are hash-verified for determinism elsewhere; this
  * spec measures what the approximation actually retrieves — recall@k
  * against the exact top-k on the real embeddings table — and pins a
  * floor, so a parameter or algorithm change that silently guts
  * retrieval quality fails CI even though its output stays
  * deterministic and oracle-consistent.
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private val K = 10

  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 20)

  private def resultSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id"), col("nn_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }

  // mean over queries of |approx ∩ exact| / |exact| — queries whose
  // bucket/probe set returned nothing still count (recall 0), so a
  // degenerate partitioner cannot hide behind absent rows
  private def recallAt(approx: DataFrame, exact: Map[Long, Set[Long]]): Double = {
    val a = resultSets(approx)
    val per = exact.map { case (q, ex) =>
      a.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size }
    per.sum / per.size
  }

  private lazy val exactSets = resultSets(
    Similarity.topK(emb, queries, "vec_id", "embedding", k = K))

  // Measured landscape (2026-08-14, sf0.001 embeddings, 20 queries,
  // K=10; candidate rate = distinct LSH candidate pairs / brute-force
  // pairs, via Similarity.lshCandidatePairs) — the synthetic embeddings
  // are near-random, the adversarial case for projection methods, so
  // recall barely clears the candidate rate ANYWHERE on the grid (LSH
  // on structureless data is little better than random subsampling;
  // the clustered-fixture test below shows the same operator genuinely
  // pruning when the data has structure):
  //   IVF  nProbe=4: 0.815   nProbe=8: 0.915   nProbe=12: 0.975
  //   LSH planes x tables -> recall / candidate_rate:
  //     2x4  0.800/0.598   2x12 0.920/0.821   3x8  0.775/0.528
  //     4x8  0.625/0.367   4x16 0.700/0.464   5x16 0.615/0.329
  //     6x24 0.535/0.278   8x32 0.420/0.179   1-table 8p: 0.065 recall
  // The round-10 gate configs (2x4, 2x12) bought recall by examining
  // 60%/82% of ALL pairs — re-pointed round 11 to the two operating
  // points that hold recall >= 0.65 with candidate rate materially
  // below 1: 4x16 and 3x8. Floors sit ~0.05 under the measurements;
  // ceilings ~0.07 over. Every ANN gate's EXACT parameters carry BOTH
  // a recall floor and a candidate-rate ceiling here: a config change
  // that guts retrieval fails the floor, one that degenerates toward
  // all-pairs fails the ceiling.

  test("IVF recall@10 at the gate parameters (nProbe=4) holds its floor") {
    val ivf = Similarity.topKIvf(emb, queries, "vec_id", "embedding",
      k = K, nCentroids = 16, nProbe = 4, kmeansIters = 2)
    val r = recallAt(ivf, exactSets)
    info(f"IVF recall@$K = $r%.3f (nCentroids=16, nProbe=4, kmeansIters=2)")
    assert(r >= 0.75, f"IVF recall@$K degraded to $r%.3f (floor 0.75)")
  }

  test("IVF recall@10 at the quality config (nProbe=8) clears 0.9") {
    val ivf = Similarity.topKIvf(emb, queries, "vec_id", "embedding",
      k = K, nCentroids = 16, nProbe = 8, kmeansIters = 2)
    val r = recallAt(ivf, exactSets)
    info(f"IVF recall@$K = $r%.3f (nCentroids=16, nProbe=8, kmeansIters=2)")
    assert(r >= 0.9, f"IVF recall@$K degraded to $r%.3f (floor 0.9)")
  }

  // fraction of brute-force (query, corpus) pairs the bucketed join
  // leaves as candidates — the selectivity companion to recall (any
  // config reaches recall 1 by degenerating to all-pairs)
  private def candidateRate(corpus: DataFrame, qs: DataFrame,
                            nPlanes: Int, nTables: Int): Double = {
    val nPairs = qs.count() * (corpus.count() - 1)
    Similarity.lshCandidatePairs(corpus, qs, "vec_id", "embedding",
      nPlanes, nTables).count().toDouble / nPairs
  }

  test("LSH at the similarity_topk_lsh GATE config (4 planes x 16 tables): recall floor AND candidate-rate ceiling") {
    val lsh = Similarity.topKLsh(emb, queries, "vec_id", "embedding",
      k = K, nPlanes = 4, nTables = 16)
    val r = recallAt(lsh, exactSets)
    val cr = candidateRate(emb, queries, 4, 16)
    info(f"LSH recall@$K = $r%.3f, candidate rate = $cr%.3f (nPlanes=4, nTables=16 — the gate parameters)")
    assert(r >= 0.65, f"gate-config LSH recall@$K degraded to $r%.3f (floor 0.65)")
    assert(cr <= 0.55, f"gate-config LSH candidate rate grew to $cr%.3f (ceiling 0.55) — degenerating toward all-pairs")
  }

  test("MLSH at the similarity_topk_mlsh GATE config (3 planes x 8 tables): recall floor AND candidate-rate ceiling") {
    val lsh = Similarity.topKLsh(emb, queries, "vec_id", "embedding",
      k = K, nPlanes = 3, nTables = 8)
    val r = recallAt(lsh, exactSets)
    val cr = candidateRate(emb, queries, 3, 8)
    info(f"MLSH recall@$K = $r%.3f, candidate rate = $cr%.3f (nPlanes=3, nTables=8 — the gate parameters)")
    assert(r >= 0.7, f"gate-config MLSH recall@$K degraded to $r%.3f (floor 0.7)")
    assert(cr <= 0.6, f"gate-config MLSH candidate rate grew to $cr%.3f (ceiling 0.6) — degenerating toward all-pairs")
  }

  test("MIPS-ANN at the similarity_topk_mips_ann GATE config (4 planes x 16 tables): recall floor AND candidate-rate ceiling") {
    // recall measured against the EXACT max-inner-product top-k (not
    // the cosine one): the norm-augmentation reduction must retrieve
    // inner-product neighbors, which is the semantics it claims
    val exactMips = resultSets(
      Similarity.topKMips(emb, queries, "vec_id", "embedding", k = K))
    val ann = Similarity.topKMipsAnn(emb, queries, "vec_id", "embedding",
      k = K, nPlanes = 4, nTables = 16)
    val r = recallAt(ann, exactMips)
    val nPairs = queries.count() * (emb.count() - 1)
    val cr = Similarity.mipsCandidatePairs(emb, queries, "vec_id", "embedding",
      4, 16).count().toDouble / nPairs
    info(f"MIPS-ANN recall@$K = $r%.3f, candidate rate = $cr%.3f (nPlanes=4, nTables=16 — the gate parameters)")
    assert(r >= 0.65, f"gate-config MIPS-ANN recall@$K degraded to $r%.3f (floor 0.65)")
    assert(cr <= 0.55, f"gate-config MIPS-ANN candidate rate grew to $cr%.3f (ceiling 0.55) — degenerating toward all-pairs")
  }

  test("MIPS-IVF at the similarity_topk_mips_ivf GATE config (16 centroids, nProbe=4) holds its floor") {
    val exactMips = resultSets(
      Similarity.topKMips(emb, queries, "vec_id", "embedding", k = K))
    val ivf = Similarity.topKMipsAnnIvf(emb, queries, "vec_id", "embedding",
      k = K, nCentroids = 16, nProbe = 4, kmeansIters = 2)
    val r = recallAt(ivf, exactMips)
    info(f"MIPS-IVF recall@$K = $r%.3f (nCentroids=16, nProbe=4, kmeansIters=2 — the gate parameters)")
    assert(r >= 0.75, f"gate-config MIPS-IVF recall@$K degraded to $r%.3f (floor 0.75)")
  }

  test("MIPS-ANN retrieves magnitude-ranked neighbors on norm-skewed data") {
    // cosine ANN alone CANNOT pass this: vectors share one dominant
    // direction but differ 10x in magnitude, so the true MIPS top-k is
    // the largest-norm vectors, not the best-aligned ones. The
    // augmentation must preserve that ordering through the buckets
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16
    val base = Array.fill(dim)(rnd.nextGaussian())
    val rows: Seq[(Long, Seq[Float])] = (0 until 200).map { i =>
      val scale = 0.5 + (i % 10) // norms spread 10x across ids mod 10
      (i.toLong, (0 until dim).map(d =>
        (scale * (base(d) + 0.3 * rnd.nextGaussian())).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val qs = df.filter(col("vec_id") < 5)
    val exact = resultSets(Similarity.topKMips(df, qs, "vec_id", "embedding", k = K))
    val ann = Similarity.topKMipsAnn(df, qs, "vec_id", "embedding",
      k = K, nPlanes = 4, nTables = 16)
    val r = recallAt(ann, exact)
    info(f"norm-skewed MIPS-ANN recall@$K = $r%.3f (nPlanes=4, nTables=16)")
    assert(r >= 0.8, f"norm-skewed MIPS-ANN recall@$K = $r%.3f (floor 0.8) — augmentation lost the magnitude ordering")
  }

  test("clustered data: LSH genuinely prunes — high recall at LOW candidate rate") {
    // 20 tight gaussian clusters of 25 vectors: the data regime LSH is
    // FOR. The same 8x8 config that manages recall 0.42 on the
    // near-random table should retrieve essentially everything here
    // while examining a small fraction of the pairs — pinning that the
    // operator's selectivity is data-limited, not implementation-lost
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 32; val nClusters = 20; val perCluster = 25
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    val rows: Seq[(Long, Seq[Float])] =
      for (c <- 0 until nClusters; m <- 0 until perCluster) yield
        ((c.toLong * perCluster + m),
          (0 until dim).map(d => (centers(c)(d) + 0.05 * rnd.nextGaussian()).toFloat))
    val df = rows.toDF("vec_id", "embedding")
    val qs = df.filter(col("vec_id") % perCluster === 0) // one query per cluster
    val exact = resultSets(Similarity.topK(df, qs, "vec_id", "embedding", k = K))
    val approx = Similarity.topKLsh(df, qs, "vec_id", "embedding",
      k = K, nPlanes = 8, nTables = 8)
    val r = recallAt(approx, exact)
    val cr = candidateRate(df, qs, 8, 8)
    info(f"clustered LSH recall@$K = $r%.3f, candidate rate = $cr%.3f (nPlanes=8, nTables=8)")
    assert(r >= 0.9, f"clustered-data LSH recall@$K = $r%.3f (floor 0.9)")
    assert(cr <= 0.3, f"clustered-data LSH candidate rate = $cr%.3f (ceiling 0.3) — pruning lost")
  }

  test("ingested IVF index: bit-identical to per-run IVF, quantizer-free probe plan") {
    val table = "graft_ivf_annspec_idx"
    Similarity.ingestIvf(emb, "vec_id", "embedding", table,
      nCentroids = 16, kmeansIters = 2, nBuckets = 4)
    val ing = Similarity.topKIvfIngested(spark, table, queries,
      "vec_id", "embedding", k = K, nProbe = 4)
    val per = Similarity.topKIvf(emb, queries, "vec_id", "embedding",
      k = K, nCentroids = 16, nProbe = 4, kmeansIters = 2)
    // bit parity: the persisted centroids/assignments ARE the per-run
    // quantizer's output (parquet round-trips doubles exactly), so the
    // full (query, neighbor, score, rank) tuples must agree exactly
    assert(ing.collect().toSet == per.collect().toSet,
      "ingested-index probe diverged from the per-run IVF")
    // recall floor holds against the PERSISTED index (the config the
    // gate serves), not just the in-memory path
    val r = recallAt(ing, exactSets)
    info(f"ingested-IVF recall@$K = $r%.3f (nCentroids=16, nProbe=4, persisted index)")
    assert(r >= 0.75, f"ingested-IVF recall@$K degraded to $r%.3f (floor 0.75)")
    // the probe plan must contain NO quantizer work: no assignment
    // argmax over the corpus (that happened at ingest) and strictly
    // fewer exchanges than the per-run plan (whose corpus side is
    // spread/normalized per call; the ingested side is one bucketed
    // scan feeding the broadcast candidate join)
    val pIng = ing.queryExecution.executedPlan.toString
    val pPer = per.queryExecution.executedPlan.toString
    def argmaxes(p: String) = "graft_centroid_argmax".r.findAllIn(p).size
    assert(argmaxes(pPer) > 0, "per-run plan must contain the assignment argmax")
    assert(argmaxes(pIng) == 0, "probe plan re-ran the corpus assignment argmax")
    def exchanges(p: String) = "(?<!Reused)Exchange".r.findAllIn(p).size
    assert(exchanges(pIng) < exchanges(pPer),
      s"ingested=${exchanges(pIng)} per-run=${exchanges(pPer)}")
  }

  test("ingested LSH index: bit-identical to per-run LSH, corpus-side hashing paid once") {
    val table = "graft_lsh_annspec_idx"
    Similarity.ingestLsh(emb, "vec_id", "embedding", table,
      nPlanes = 4, nTables = 16, nBuckets = 4)
    val ing = Similarity.topKLshIngested(spark, table, queries,
      "vec_id", "embedding", k = K)
    val per = Similarity.topKLsh(emb, queries, "vec_id", "embedding",
      k = K, nPlanes = 4, nTables = 16)
    assert(ing.collect().toSet == per.collect().toSet,
      "ingested-index LSH diverged from the per-run path")
    // the probe must hash ONLY the query side: the per-run plan
    // evaluates hyperplane buckets on both corpus and queries, the
    // ingested plan on queries alone — strictly fewer occurrences
    def buckets(p: String) = "graft_hyperplane_bucket".r.findAllIn(p).size
    val pIng = ing.queryExecution.executedPlan.toString
    val pPer = per.queryExecution.executedPlan.toString
    assert(buckets(pIng) > 0, "query side must still hash")
    assert(buckets(pIng) < buckets(pPer),
      s"ingested=${buckets(pIng)} per-run=${buckets(pPer)}")
  }

  test("LSH table amplification is monotone: more tables never retrieve less") {
    val r1 = recallAt(Similarity.topKLsh(emb, queries, "vec_id", "embedding",
      k = K, nPlanes = 2, nTables = 1), exactSets)
    val r4 = recallAt(Similarity.topKLsh(emb, queries, "vec_id", "embedding",
      k = K, nPlanes = 2, nTables = 4), exactSets)
    info(f"MLSH recall@$K: 1 table $r1%.3f -> 4 tables $r4%.3f")
    assert(r4 >= r1, "adding tables must never lose candidates (union semantics)")
  }

  test("SQ8: corpus-wide candidate budget reproduces the exact top-k bit-for-bit") {
    // with nCandidates = |corpus| every vector reaches the rescore, so
    // the quantized coarse pass cannot drop a true neighbor and the
    // EXACT rescore must reproduce topK including scores and ranks
    val n = emb.count().toInt
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", k = K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val sq = Similarity.topKSq8(emb, queries, "vec_id", "embedding",
      k = K, nCandidates = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(sq === exact, "full-budget SQ8 must equal exact brute force")
  }

  test("SQ8: gate-config recall floor at the 4k candidate budget") {
    // int8 per-dimension error is <= scale/2 ~ 0.004 on normalized
    // vectors — tiny next to the score gaps on this fixture, so the
    // coarse ranking rarely reorders across the candidate boundary.
    // Measured 2026-08-15: recall@10 = 1.000 at nCandidates=40; pin a
    // generous floor so a quantizer regression (wrong scale, clamp bug,
    // symmetric-vs-asymmetric mixup) fails loudly
    val r = recallAt(Similarity.topKSq8(emb, queries, "vec_id", "embedding",
      k = K, nCandidates = 4 * K), exactSets)
    info(f"SQ8 recall@$K at 4k candidates: $r%.3f")
    assert(r >= 0.9, f"SQ8 recall collapsed: $r%.3f")
  }

  test("bitext margin mining: planted translations rank 1 with margin >= 1") {
    import spark.implicits._
    // tgt = exact copies of src under offset ids: each src's true pair
    // scores cos 1.0 and its margin (cos over avg-kNN) must put the
    // copy at rank 1 for every src sentence
    val src = emb.filter(col("vec_id") < 30)
      .select(col("vec_id"), col("embedding"))
    val tgt = src.select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val mined = Similarity.bitextMine(src, tgt, "vec_id", "embedding", k = 4)
    val top = mined.filter(col("rank") === 1)
      .select(col("src_id"), col("tgt_id"), col("margin")).collect()
    assert(top.length === 30)
    top.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) + 1000L,
        s"src ${r.getLong(0)} mined ${r.getLong(1)}, expected the planted copy")
      assert(r.getDouble(2) >= 1.0,
        s"planted pair margin ${r.getDouble(2)} below 1 — kNN average can't exceed cos 1.0")
    }
  }

  // PQ landscape on the same near-random embeddings (2026-08-15,
  // K=10, nCodes=8, 2 Lloyd's rounds unless noted): the GATE config
  // (m=4, nCand=20 — 64 dims to 4 codes, a deliberately extreme 64x
  // compression that exercises the full codebook/reconstruction path)
  // measures recall 0.295; widening either knob recovers it exactly as
  // PQ theory predicts: nCand 40/80 -> 0.460/0.675 at m=4; m=8/16 at
  // nCand=40 -> 0.510/0.680; the QUALITY config m=16, nCand=80 ->
  // 0.885 (nCand=120 -> 0.930); nCodes 16/32 at m=8, nCand=80 ->
  // 0.805/0.885. Floors pinned ~0.05 under the measurements.
  test("PQ at the gate config (m=4, nCodes=8, nCand=20): recall floor at extreme compression") {
    val pq = Similarity.topKPq(emb, queries, "vec_id", "embedding",
      k = K, m = 4, nCodes = 8, kmeansIters = 2, nCandidates = 20)
    val r = recallAt(pq, exactSets)
    assert(r >= 0.24, s"PQ gate-config recall@10 $r below floor 0.24")
  }

  test("PQ at the quality config (m=16, nCodes=8, nCand=80) clears 0.82") {
    val pq = Similarity.topKPq(emb, queries, "vec_id", "embedding",
      k = K, m = 16, nCodes = 8, kmeansIters = 2, nCandidates = 80)
    val r = recallAt(pq, exactSets)
    assert(r >= 0.82, s"PQ quality-config recall@10 $r below floor 0.82")
  }

  test("PQ candidate budget is monotone: a superset of candidates never lowers recall") {
    // truth = exact top-K and k = K, so a displaced true candidate can
    // only be displaced by a higher-exact-score item, which is then
    // itself in the truth set — recall is monotone in nCandidates by
    // construction; this pins that the implementation preserves it
    val narrow = Similarity.topKPq(emb, queries, "vec_id", "embedding",
      k = K, m = 4, nCodes = 8, kmeansIters = 2, nCandidates = 20)
    val wide = Similarity.topKPq(emb, queries, "vec_id", "embedding",
      k = K, m = 4, nCodes = 8, kmeansIters = 2, nCandidates = 80)
    assert(recallAt(wide, exactSets) >= recallAt(narrow, exactSets))
  }

  test("PQ degenerate codebook (one subspace, one code per vector) reproduces exact top-k") {
    // with m=1, nCodes = |corpus|, iters=0 every vector is its own
    // seed codeword: reconstruction is the identity, the coarse pass
    // IS the exact pass, and the result must match topK bit-for-bit
    // even at the tightest candidate budget
    val small = emb.filter(col("vec_id") < 60)
    val q = small.filter(col("vec_id") < 10)
    val viaPq = Similarity.topKPq(small, q, "vec_id", "embedding",
      k = 5, m = 1, nCodes = 60, kmeansIters = 0, nCandidates = 5).collect().toSet
    val viaTopK = Similarity.topK(small, q, "vec_id", "embedding", k = 5)
      .collect().toSet
    assert(viaPq === viaTopK)
  }

  test("PQ corpus-wide candidate budget reproduces the exact top-k bit-for-bit") {
    // nCandidates >= |corpus|: the rescore sees every corpus vector, so
    // however lossy the codebooks, the output is the exact ranking
    val viaPq = Similarity.topKPq(emb, queries, "vec_id", "embedding",
      k = K, m = 4, nCodes = 8, kmeansIters = 2, nCandidates = 1000)
      .collect().toSet
    val viaTopK = Similarity.topK(emb, queries, "vec_id", "embedding", k = K)
      .collect().toSet
    assert(viaPq === viaTopK)
  }

  test("MMR at λ=1 degenerates to the relevance ranking") {
    // with no diversity term the greedy argmax is the score order, so
    // selection order must equal the candidate ranks 1..k verbatim
    val cand = Similarity.topK(emb, queries, "vec_id", "embedding", k = 20)
    val viaMmr = Similarity.diversifyMmr(cand, emb, "vec_id", "embedding",
      k = 5, lambda = 1.0)
      .select(col("query_id"), col("nn_id"), col("rank")).collect().toSet
    val viaTopK = cand.filter(col("rank") <= 5)
      .select(col("query_id"), col("nn_id"), col("rank")).collect().toSet
    assert(viaMmr === viaTopK)
  }

  test("MMR swaps a planted duplicate for coverage; plain top-k keeps it") {
    import spark.implicits._
    // corpus: a (most relevant), a2 (exact copy of a), b (less relevant,
    // different direction). Relevance top-2 = {a, a2}; MMR at λ=0.5 must
    // keep a (tie → lowest id) then swap the redundant a2 for b:
    //   mmr(a2) = .5·cos(q,a) − .5·1.0   < 0
    //   mmr(b)  = .5·cos(q,b) − .5·cos(b,a) — positive by construction
    val corpus = Seq(
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq(0.6f, 0.0f, 0.8f, 0.0f)),
      (100L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 100L)
    val cand = Similarity.topK(corpus, q, "vec_id", "embedding", k = 3)
    val top2 = cand.filter(col("rank") <= 2).select(col("nn_id"))
      .collect().map(_.getLong(0)).toSet
    assert(top2 === Set(1L, 2L), "relevance top-2 must be the duplicate pair")
    val mmr = Similarity.diversifyMmr(cand, corpus, "vec_id", "embedding",
      k = 2, lambda = 0.5)
      .orderBy(col("rank")).collect().map(_.getLong(1))
    assert(mmr.toSeq === Seq(1L, 3L),
      s"MMR picked ${mmr.toSeq}, expected duplicate swapped for coverage")
  }

  test("MMR invariants: ranks are 1..k per query, picks drawn from the candidate set") {
    val cand = Similarity.topK(emb, queries, "vec_id", "embedding", k = 20)
    val candSet = cand.select(col("query_id"), col("nn_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.diversifyMmr(cand, emb, "vec_id", "embedding",
      k = 5, lambda = 0.5).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === 20)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq === (1 to 5),
        s"query $q ranks not 1..5")
      assert(rs.map(_.getLong(1)).distinct.length === 5, s"query $q repeated a pick")
      rs.foreach(r => assert(candSet.contains((q, r.getLong(1))),
        s"query $q picked a non-candidate"))
    }
  }

  test("ingested PQ index: bit-identical to per-run PQ, codebook-free probe plan") {
    val table = "graft_pq_annspec_idx"
    Similarity.ingestPq(emb, "vec_id", "embedding", table,
      m = 4, nCodes = 8, kmeansIters = 2, nBuckets = 4)
    val ing = Similarity.topKPqIngested(spark, table, queries,
      "vec_id", "embedding", k = K, nCandidates = 80)
    val per = Similarity.topKPq(emb, queries, "vec_id", "embedding",
      k = K, m = 4, nCodes = 8, kmeansIters = 2, nCandidates = 80)
    // bit parity: the persisted codes ARE the per-run assignment (codes
    // are a pure function of the frozen codebooks; parquet round-trips
    // longs/doubles exactly), so full tuples must agree exactly
    assert(ing.collect().toSet == per.collect().toSet,
      "ingested-index probe diverged from the per-run PQ")
    val r = recallAt(ing, exactSets)
    info(f"ingested-PQ recall@$K = $r%.3f (m=4, nCodes=8, nCand=80, persisted)")
    assert(r >= 0.60, f"ingested-PQ recall@$K degraded to $r%.3f (floor 0.60)")
    // the probe plan must contain NO assignment work: the per-run plan
    // codes the corpus with the argmin-L2 argmax, the probe only looks
    // codes up from the sidecar literal
    def argmaxes(p: String) = "graft_centroid_argmax".r.findAllIn(p).size
    val pIng = ing.queryExecution.executedPlan.toString
    val pPer = per.queryExecution.executedPlan.toString
    assert(argmaxes(pPer) > 0, "per-run plan must contain the coding argmax")
    assert(argmaxes(pIng) == 0, "probe plan re-coded the corpus")
  }

  test("appended PQ index ≡ coding the union under the frozen codebooks") {
    val table = "graft_pq_annspec_app"
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
    Similarity.ingestPq(even, "vec_id", "embedding", table,
      m = 4, nCodes = 8, kmeansIters = 2, nBuckets = 4)
    Similarity.appendPq(spark, table, odd, "vec_id", "embedding")
    val appended = Similarity.topKPqIngested(spark, table, queries,
      "vec_id", "embedding", k = K, nCandidates = 40).collect().toSet
    assert(appended.nonEmpty)
    // structural invariants of the union index: every corpus id coded
    // exactly once, m codes per vector, every code a codeword id from
    // the frozen even-half codebook (seeds were even ids, means keep
    // seed ids — so odd rows coded against frozen books can only carry
    // even cids; an odd cid would mean append retrained)
    val codeRows = spark.table(table).collect()
    assert(codeRows.length === emb.count().toInt)
    assert(codeRows.map(_.getLong(0)).distinct.length === codeRows.length)
    val bookCids = spark.table(s"${table}_codebooks")
      .select(col("cid")).collect().map(_.getLong(0)).toSet
    codeRows.foreach { r =>
      val codes = r.getSeq[Long](1)
      assert(codes.length === 4, s"id ${r.getLong(0)} has ${codes.length} codes")
      codes.foreach(cd => assert(bookCids.contains(cd),
        s"id ${r.getLong(0)} carries non-codebook code $cd"))
    }
    // the gate's oracle (pqTopKSqlTrainOn over the even half) is the
    // cross-engine proof that this equals coding the union under the
    // frozen codebooks; here we additionally pin that the appended
    // index serves the same rows as a SECOND identical ingest+append
    // (full determinism of the maintenance path)
    val table2 = "graft_pq_annspec_app_ref"
    Similarity.ingestPq(even, "vec_id", "embedding", table2,
      m = 4, nCodes = 8, kmeansIters = 2, nBuckets = 4)
    Similarity.appendPq(spark, table2, odd, "vec_id", "embedding")
    val again = Similarity.topKPqIngested(spark, table2, queries,
      "vec_id", "embedding", k = K, nCandidates = 40).collect().toSet
    assert(appended === again, "append path is not deterministic")
  }

  test("ANN bitext mining: planted exact copies always share buckets and rank 1") {
    // identical vectors hash identically in every table, so a planted
    // copy is ALWAYS a candidate regardless of LSH randomness; the
    // margin property then matches the exact miner's
    val src = emb.filter(col("vec_id") < 30)
      .select(col("vec_id"), col("embedding"))
    val tgt = src.select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val mined = Similarity.bitextMineAnn(src, tgt, "vec_id", "embedding",
      k = 4, nPlanes = 4, nTables = 16)
    val top = mined.filter(col("rank") === 1)
      .select(col("src_id"), col("tgt_id"), col("margin")).collect()
    assert(top.length === 30)
    top.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) + 1000L,
        s"src ${r.getLong(0)} mined ${r.getLong(1)}, expected the planted copy")
      assert(r.getDouble(2) >= 1.0)
    }
  }

  test("pqSink heals an empty first delivery: codebooks train on the first non-empty batch") {
    val table = "graft_pq_annspec_heal"
    Seq(table, s"${table}_vectors", s"${table}_codebooks", s"${table}_commits")
      .foreach(graft.ops.Bucketing.dropManaged(spark, _))
    val deliver = Similarity.pqSink(table, "vec_id", "embedding",
      m = 4, nCodes = 8, kmeansIters = 2, nBuckets = 4)
    deliver(emb.where(lit(false)), 0L) // streams commonly start empty
    deliver(emb, 1L)                   // the quantizer must train HERE
    val served = Similarity.topKPqIngested(spark, table, queries,
      "vec_id", "embedding", k = 5, nCandidates = 20).collect().toSet
    val per = Similarity.topKPq(emb, queries, "vec_id", "embedding",
      k = 5, m = 4, nCodes = 8, kmeansIters = 2, nCandidates = 20)
      .collect().toSet
    assert(served === per,
      "healed index diverged from training on the full (only real) batch")
  }

  test("hard negatives: never a positive, never self; empty positives ≡ plain topK") {
    import spark.implicits._
    // positive set = same label (the gate's supervised-contrastive shape)
    val pos = queries.select(col("vec_id").as("query_id"), col("label"))
      .join(emb.select(col("vec_id").as("pos_id"), col("label")), Seq("label"))
      .select(col("query_id"), col("pos_id"))
    val posSet = pos.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mined = Similarity.hardNegatives(emb, queries, pos,
      "vec_id", "embedding", k = K).collect()
    assert(mined.map(_.getLong(0)).distinct.length === 20)
    mined.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(n !== q, s"query $q mined itself")
      assert(!posSet.contains((q, n)), s"query $q mined its positive $n")
    }
    // with no positives the operator IS topK — the anti-join must be
    // a pure pass-through, not a semantics change
    val none = Seq.empty[(Long, Long)].toDF("query_id", "pos_id")
    val viaHn = Similarity.hardNegatives(emb, queries, none,
      "vec_id", "embedding", k = K).collect().toSet
    val viaTopK = Similarity.topK(emb, queries, "vec_id", "embedding", k = K)
      .collect().toSet
    assert(viaHn === viaTopK)
  }

  test("IVF-PQ composed recall@10 holds its floor; never below BOTH parents' losses compounded") {
    val ivfpq = Similarity.topKIvfPq(emb, queries, "vec_id", "embedding",
      k = K, nCentroids = 16, nProbe = 4, m = 4, nCodes = 8,
      kmeansIters = 2, nCandidates = 40)
    val r = recallAt(ivfpq, exactSets)
    info(f"IVF-PQ recall@$K = $r%.3f (16 cells/nProbe 4 × m4/8codes, nCand 40)")
    // the composition loses on two axes (cell pruning AND code
    // quantization of the coarse ranking) — the floor sits under the
    // measured value with the usual ~0.05 margin; the IVF parent alone
    // measures 0.815 at nProbe=4
    assert(r >= 0.55, f"IVF-PQ recall@$K degraded to $r%.3f (floor 0.55)")
  }

  test("IVF-PQ ingested probe is bit-identical to the per-run operator") {
    val table = "graft_recall_ivfpq"
    val deps = Seq(table, s"${table}_vectors", s"${table}_centroids",
      s"${table}_codebooks", s"${table}_tombstones")
    deps.foreach(graft.ops.Bucketing.dropManaged(spark, _))
    try {
      Similarity.ingestIvfPq(emb, "vec_id", "embedding", table,
        nCentroids = 16, m = 4, nCodes = 8, kmeansIters = 2, nBuckets = 4)
      val served = Similarity.topKIvfPqIngested(spark, table, queries,
        "vec_id", "embedding", k = 5, nProbe = 4, nCandidates = 20)
        .collect().toSet
      val per = Similarity.topKIvfPq(emb, queries, "vec_id", "embedding",
        k = 5, nCentroids = 16, nProbe = 4, m = 4, nCodes = 8,
        kmeansIters = 2, nCandidates = 20).collect().toSet
      assert(served === per,
        "persisted IVF-PQ probe must equal the per-run operator bit-for-bit")
    } finally deps.foreach(graft.ops.Bucketing.dropManaged(spark, _))
  }

  test("residual IVF-PQ recall at the gate parameters holds a floor STRICTLY above the global-codebook gate's") {
    // equal compression budget (m=4, nCodes=8, nCand=40 — identical to
    // the global-codebook test above, whose floor is 0.55): residual
    // codes quantize v − centroid(cell) with per-cell books, so the
    // coarse ranking is more faithful per byte and the floor moves up
    val res = Similarity.topKIvfPqResidual(emb, queries, "vec_id", "embedding",
      k = K, nCentroids = 16, nProbe = 4, m = 4, nCodes = 8,
      kmeansIters = 2, nCandidates = 40)
    val r = recallAt(res, exactSets)
    // measured 0.755 (2026-08-15) vs the global-codebook gate's 0.620 —
    // floor with the usual ~0.05 margin, sitting 0.15 above global's
    info(f"residual IVF-PQ recall@$K = $r%.3f (16 cells/nProbe 4 × m4/8codes per cell, nCand 40)")
    assert(r >= 0.70, f"residual IVF-PQ recall@$K degraded to $r%.3f (floor 0.70 — must stay above the global gate's 0.55)")
  }

  test("residual IVF-PQ ingested probe is bit-identical to the per-run operator") {
    val table = "graft_recall_rivfpq"
    val deps = Seq(table, s"${table}_vectors", s"${table}_centroids",
      s"${table}_cellbooks", s"${table}_tombstones", s"${table}_batches")
    deps.foreach(graft.ops.Bucketing.dropManaged(spark, _))
    try {
      Similarity.ingestIvfPqResidual(emb, "vec_id", "embedding", table,
        nCentroids = 16, m = 4, nCodes = 8, kmeansIters = 2, nBuckets = 4)
      val served = Similarity.topKIvfPqResidualIngested(spark, table, queries,
        "vec_id", "embedding", k = 5, nProbe = 4, nCandidates = 20)
        .collect().toSet
      val per = Similarity.topKIvfPqResidual(emb, queries, "vec_id", "embedding",
        k = 5, nCentroids = 16, nProbe = 4, m = 4, nCodes = 8,
        kmeansIters = 2, nCandidates = 20).collect().toSet
      assert(served == per,
        "persisted residual index must serve bit-identically to the per-run operator")
    } finally deps.foreach(graft.ops.Bucketing.dropManaged(spark, _))
  }

  test("residual IVF-PQ: the forced codebook-TABLE path is bit-identical to the literal path") {
    val table = "graft_recall_rivfpq_bt"
    val deps = Seq(table, s"${table}_vectors", s"${table}_centroids",
      s"${table}_cellbooks", s"${table}_tombstones", s"${table}_batches")
    deps.foreach(graft.ops.Bucketing.dropManaged(spark, _))
    try {
      Similarity.ingestIvfPqResidual(emb, "vec_id", "embedding", table,
        nCentroids = 16, m = 4, nCodes = 8, kmeansIters = 2, nBuckets = 4)
      val lit = Similarity.topKIvfPqResidualIngested(spark, table, queries,
        "vec_id", "embedding", k = 5, nProbe = 4, nCandidates = 20)
        .collect().toSet
      // maxLiteralBookRows = 0 forces the production form: reconstruction
      // joins the cluster-keyed _cellbooks table, the driver never
      // collects a codeword — same doubles, same addition order
      val tab = Similarity.topKIvfPqResidualIngested(spark, table, queries,
        "vec_id", "embedding", k = 5, nProbe = 4, nCandidates = 20,
        maxLiteralBookRows = 0).collect().toSet
      assert(tab == lit,
        "the codebook-table serving path must be bit-identical to the literal path")
    } finally deps.foreach(graft.ops.Bucketing.dropManaged(spark, _))
  }

  test("residual coding beats the global codebook at equal (m, nCodes) on clustered data — the distribution it exists for") {
    import spark.implicits._
    // deterministic clustered fixture: 8 well-separated cells ± small
    // arithmetic noise. Residual coding's premise is that the centroid
    // explains most of a vector's energy so the codes spend their bits
    // on the remainder; the near-random real embeddings are the
    // adversarial case (residual ≈ vector there), so the HEADROOM claim
    // is pinned where the premise holds, and the floor above guards the
    // adversarial case separately.
    val dim = 16
    val rows = for (c <- 0 until 8; i <- 0 until 40) yield {
      val id = (c * 40 + i).toLong
      val v = (0 until dim).map { d =>
        val base =
          if (d % 8 == c % 8) 10.0f
          else if ((d + c) % 5 == 0) 4.0f
          else 0.5f
        base + (((id * 31 + d * 17) % 19).toInt - 9) * 0.08f
      }
      (id, v)
    }
    val data = rows.toDF("vec_id", "embedding")
    val qs = data.filter(col("vec_id") % 40 < 3)
    val exact = resultSets(Similarity.topK(data, qs, "vec_id", "embedding", k = K))
    // nProbe = all cells isolates CODE quality (both variants see every
    // candidate — only the coarse-ranking fidelity differs); m=4 codes
    // of 4 words each is deliberately tight so the global book underfits
    val glob = recallAt(Similarity.topKIvfPq(data, qs, "vec_id", "embedding",
      k = K, nCentroids = 8, nProbe = 8, m = 4, nCodes = 4,
      kmeansIters = 2, nCandidates = 20), exact)
    val res = recallAt(Similarity.topKIvfPqResidual(data, qs, "vec_id", "embedding",
      k = K, nCentroids = 8, nProbe = 8, m = 4, nCodes = 4,
      kmeansIters = 2, nCandidates = 20), exact)
    info(f"clustered fixture recall@$K: residual = $res%.3f vs global = $glob%.3f")
    assert(res > glob,
      f"residual coding must beat the global codebook on clustered data: $res%.3f <= $glob%.3f")
  }

  test("RRF fusion dominance: a doc in BOTH legs' top-10 outranks every single-leg doc") {
    // the provable fusion property behind the capstone: with kRrf=60 and
    // per-list k=10, a both-lists doc scores >= 2/(60+10) = 0.028571,
    // strictly above any single-list doc's max 1/61 = 0.016393 — so the
    // fused ranking can never prefer a one-leg doc over a two-leg doc
    import graft.llm.Retrieval
    val q = emb.filter(col("vec_id") < 20)
    val cos = Similarity.topK(emb, q, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("nn_id").as("doc"), col("rank"))
    val mips = Similarity.topKMips(emb, q, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("nn_id").as("doc"), col("rank"))
    val inBoth = cos.join(mips, Seq("query_id", "doc"))
      .select(col("query_id"), col("doc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fused = Retrieval.rrfFuse(Seq(cos, mips), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val byQuery = fused.groupBy(_._1)
    inBoth.groupBy(_._1).foreach { case (qid, docs) =>
      val ranked = byQuery(qid).sortBy(_._3).map(_._2)
      val nBoth = math.min(docs.size, 10)
      assert(ranked.take(nBoth).forall(d => docs.exists(_._2 == d)),
        s"query $qid: a single-leg doc outranked a both-legs doc in ${ranked.toSeq}")
    }
  }

  test("bitext miners keep same-id src/tgt pairs (line-aligned corpora, the diagonal)") {
    // line-aligned parallel corpora commonly number both sides
    // identically; a same-relation self-exclusion would drop exactly
    // the true diagonal pairs. With tgt = src verbatim, every source
    // sentence's best candidate IS its own id (cosine 1.0) — the
    // pre-fix behavior silently excluded all of them.
    val side = emb.filter(col("vec_id") < 50)
    val mined = Similarity.bitextMine(side, side, "vec_id", "embedding", k = 2)
      .filter(col("rank") === 1).collect()
    assert(mined.length === 50, s"every src must mine a pair, got ${mined.length}")
    mined.foreach { r =>
      assert(r.getLong(0) === r.getLong(1),
        s"src ${r.getLong(0)}'s best pair must be its identical twin, got ${r.getLong(1)}")
    }
  }
}
