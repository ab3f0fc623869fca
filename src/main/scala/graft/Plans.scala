package graft

/** Plan/timing capture tool for the optimization rounds: for each named
  * query, write `.explain("formatted")` output to `<outDir>/<name>.txt`
  * and optionally time one run (the Bench `count()` action) with the
  * job labeled so the SQL tab / event logs attribute stages. Usage:
  *
  *   sbt "runMain graft.Plans <sfDir> <outDir> [time] name1 name2 ..."
  *
  * Reads SPARK_GRAFT_CPUS like Bench. Plans are captured AFTER one
  * warm-up execution at the same dir so builtOnce tables exist and the
  * captured plan is the steady-state serving plan (what the bench
  * times), not the cold build plan.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Plans <sfDir> <outDir> [time] names...")
    val sfDir = args(0)
    val outDir = new java.io.File(args(1))
    outDir.mkdirs()
    val doTime = args(2) == "time"
    val names = (if (doTime) args.drop(3) else args.drop(2)).toSeq
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-plans", Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"warm: $name")
      fn(spark, sfDir).count() // warm: builds builtOnce tables, compiles codegen
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val f = new java.io.File(outDir, s"$name.txt")
      val w = new java.io.PrintWriter(f)
      try w.write(plan) finally w.close()
      if (doTime) {
        val times = (1 to 3).map { i =>
          spark.sparkContext.setJobDescription(s"timed$i: $name")
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[plans] $name%-50s ${times.map(t => f"$t%.3f").mkString(" ")}")
      } else println(s"[plans] $name -> $f")
    }
    spark.stop()
  }
}
