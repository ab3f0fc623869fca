package graft

import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Throwaway profiling harness for the IVF query (not part of the API). */
object ProfIvf {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder("prof-ivf", Some("local[32]"), Some(32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def e = spark.read.parquet(s"$dir/embeddings.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  (rows=$n)")
    }
    // warm the plans once
    Similarity.topKIvf(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
      k = 5, nCentroids = 16, nProbe = 4, kmeansIters = 2).count()
    for (_ <- 1 to 2) {
      time("iters=2 salts=auto (bench)") {
        Similarity.topKIvf(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 5, nCentroids = 16, nProbe = 4, kmeansIters = 2).count()
      }
      time("iters=2 salts=8 (no count)") {
        Similarity.topKIvf(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 5, nCentroids = 16, nProbe = 4, nSalts = 8, kmeansIters = 2).count()
      }
      time("iters=1 salts=8") {
        Similarity.topKIvf(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 5, nCentroids = 16, nProbe = 4, nSalts = 8, kmeansIters = 1).count()
      }
      time("iters=0 salts=8") {
        Similarity.topKIvf(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 5, nCentroids = 16, nProbe = 4, nSalts = 8, kmeansIters = 0).count()
      }
      time("iters=0 salts=auto") {
        Similarity.topKIvf(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 5, nCentroids = 16, nProbe = 4, kmeansIters = 0).count()
      }
    }
    spark.stop()
  }
}
