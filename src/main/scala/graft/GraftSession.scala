package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory: the configuration this engine assumes.
  *
  *  - AQE on with skew-join handling (runtime re-plan + skew splitting
  *    are the 100 TB defense the static plans can't provide);
  *  - shuffle partitions sized from the environment (a cluster submit
  *    overrides; local runs default to the core count, not Spark's 200);
  *  - `graft_dot`/SQL function registration via [[functions.GraftExtensions]];
  *  - nanos-parquet tolerance (TIMESTAMP(NANOS) sources read as long);
  *  - UTC session timezone so date renders are environment-independent.
  */
object GraftSession {
  def builder(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions
      .orElse(sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt))
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    master.fold(b)(b.master)
  }
}
