package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    spark.read.parquet("/root/testdata/sf0.1/region.parquet").count()
    for (i <- 1 to 3) time(s"minhash run $i")(
      println(SparkEntry.queries("dedup_minhash_lsh")(spark, "/root/testdata/sf0.1").count()))
    spark.stop()
  }
}
