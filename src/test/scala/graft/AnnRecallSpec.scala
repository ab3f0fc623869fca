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

  // Measured landscape (2026-08-13, sf0.001 embeddings, 20 queries,
  // K=10) — the synthetic embeddings are near-random, the adversarial
  // case for projection methods, so these floors are DATA-limited, not
  // implementation-limited:
  //   IVF  nProbe=4:  0.815   nProbe=8: 0.915   nProbe=12: 0.975
  //   LSH  1 table, 8 planes: 0.065 (selective but recall-starved here)
  //   MLSH 2 planes x L tables: L=4 0.800, L=8 0.875, L=12 0.920
  // Floors sit ~0.05 under the measurements to absorb k-means/plane
  // family tweaks without letting a real quality regression through.
  // Every ANN gate's EXACT parameters carry a pinned floor here:
  // similarity_topk_ivf (16, nProbe=4), similarity_topk_lsh (2x4,
  // re-pointed round 10 off the 0.065 single-table config),
  // similarity_topk_mlsh (2x12).

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

  test("LSH recall@10 at the similarity_topk_lsh GATE config (2 planes x 4 tables) holds its floor") {
    val lsh = Similarity.topKLsh(emb, queries, "vec_id", "embedding",
      k = K, nPlanes = 2, nTables = 4)
    val r = recallAt(lsh, exactSets)
    info(f"LSH recall@$K = $r%.3f (nPlanes=2, nTables=4 — the gate parameters)")
    assert(r >= 0.75, f"gate-config LSH recall@$K degraded to $r%.3f (floor 0.75)")
  }

  test("MLSH recall@10 at the similarity_topk_mlsh GATE config (2 planes x 12 tables) clears 0.9") {
    val lsh = Similarity.topKLsh(emb, queries, "vec_id", "embedding",
      k = K, nPlanes = 2, nTables = 12)
    val r = recallAt(lsh, exactSets)
    info(f"MLSH recall@$K = $r%.3f (nPlanes=2, nTables=12 — the gate parameters)")
    assert(r >= 0.9, f"gate-config MLSH recall@$K degraded to $r%.3f (floor 0.9)")
  }

  test("LSH table amplification is monotone: more tables never retrieve less") {
    val r1 = recallAt(Similarity.topKLsh(emb, queries, "vec_id", "embedding",
      k = K, nPlanes = 2, nTables = 1), exactSets)
    val r4 = recallAt(Similarity.topKLsh(emb, queries, "vec_id", "embedding",
      k = K, nPlanes = 2, nTables = 4), exactSets)
    info(f"MLSH recall@$K: 1 table $r1%.3f -> 4 tables $r4%.3f")
    assert(r4 >= r1, "adding tables must never lose candidates (union semantics)")
  }
}
