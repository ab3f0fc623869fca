package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{EtlLeaf, EtlObj, EtlSchema}
import graft.ops._
import graft.llm._
import GateSupport._

/** Driver contract: one named query per implemented operator (SURVEY §2 +
  * the LLM-pipeline family), each with DuckDB-equivalent oracle SQL over
  * the same parquet tables. Column names and numeric types are aligned on
  * both sides (the driver sorts columns by name and hashes values), and
  * every rounded double uses [[Num.r6]] — the identical
  * `floor(x*1e6+0.5)/1e6` float expression — in both engines.
  */
object SparkEntry {

  /** One entry per operator: (name, spark fn, oracle SQL) — composed
    * from the per-family registries (EtlGates, OlapGates,
    * SourceEventGates, DedupGates, TextCorpusGates, MultimodalGates).
    */
  private lazy val registry: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    EtlGates.all ++ OlapGates.all ++ SourceEventGates.all ++
      DedupGates.all ++ TextCorpusGates.all ++ MultimodalGates.all ++
      SketchGates.all

  // ------------------------------------------------------------ driver API

  /** Flagship query on sf=0.001: the view chain + double self-join extract
    * composed end-to-end; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val base = viewFlagship(spark, dir)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    Extract.extract(base, Seq(
      "first_order" -> (Extract.Lookup(orders, "c_custkey", "o_custkey",
        Seq("o_orderkey" -> "first_order")): Extract.Extractor),
      "has_order" -> Extract.ExprField(Seq("first_order"),
        _ => col("first_order").isNotNull)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, f, _) => n -> f }.toMap

  def oracleSql: Map[String, String] =
    registry.map { case (n, _, sql) => n -> sql }.toMap
}

