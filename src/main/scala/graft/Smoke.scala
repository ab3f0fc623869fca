package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: run `SparkEntry.entry` (sf0.001 flagship) and
  * print its row count + schema — mirrors the driver's rows>0 check.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder("graft-smoke", Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"[smoke] entry rows=${df.count()} schema=${df.schema.simpleString}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
