package graft

import org.apache.spark.sql.functions._

// temporary experiment: is hash partitioning preserved through
// localCheckpoint, with and without an explicit repartition?
object ScratchExp {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("scratch", Some("local[8]"), Some(8))
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = (1L to 100000L).map(i => (i % 997, i)).toDF("src", "dst")
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    val eDeg0 = e.join(deg, "src").localCheckpoint(true)
    val eDeg1 = e.join(deg, "src").repartition(col("src")).localCheckpoint(true)
    val ranks = (0L to 996L).map(n => (n, 0.001)).toDF("node", "rank").localCheckpoint(true)
    def probe(name: String, eDeg: org.apache.spark.sql.DataFrame): Unit = {
      val j = eDeg.join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy("dst").agg(sum(col("rank") / col("deg")).as("insum"))
      val plan = j.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val nEx = "Exchange".r.findAllIn(plan).size
      println(s"=== $name exchanges=$nEx")
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("partitioning") || l.contains("ExistingRDD"))
        .mkString("\n"))
    }
    probe("plain-checkpoint", eDeg0)
    probe("repartition-then-checkpoint", eDeg1)
    val dbg = e.join(deg, "src")
    val qe = dbg.queryExecution
    val phys = qe.executedPlan
    phys.execute().count()
    val fin = phys match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println(s"=== finalPlan top ${fin.getClass.getSimpleName} partitioning " +
      s"${fin.outputPartitioning.getClass.getSimpleName}: ${fin.outputPartitioning}")
    val eDeg2 = Partitioning.checkpointKeyed(e.join(deg, "src"), "src")
    probe("bridge-checkpoint", eDeg2)
    val ranksK = Partitioning.checkpointKeep(
      eDeg2.join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("rank") / col("deg")).as("rank")))
    val it2 = eDeg2.join(ranksK.withColumnRenamed("node", "src"), "src")
      .groupBy("dst").agg(sum(col("rank") / col("deg")).as("insum"))
    val p2 = it2.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println(s"=== iter2 exchanges=${"Exchange".r.findAllIn(p2).size} sorts=${"Sort \\(".r.findAllIn(p2).size}")
    println(p2.linesIterator.filter(l => l.contains("Exchange") || l.contains("ExistingRDD,"))
      .mkString("\n"))
    // results must be identical to the plain checkpoint
    val a = eDeg0.join(ranks.withColumnRenamed("node", "src"), "src")
      .groupBy("dst").agg(sum(col("rank") / col("deg")).as("insum"))
    val b = eDeg2.join(ranks.withColumnRenamed("node", "src"), "src")
      .groupBy("dst").agg(sum(col("rank") / col("deg")).as("insum"))
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"=== result-diff $diff (expect 0), rows=${b.count()}")
    spark.stop()
  }
}
