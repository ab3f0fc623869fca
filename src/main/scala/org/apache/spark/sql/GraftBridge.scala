package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 wraps Columns around ColumnNode
  * and scopes the converters `private[sql]`; custom Catalyst expressions
  * still need them, so this object re-exports the two functions — the
  * conventional extension-library shim, no internals re-implemented.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** For plans that are pure NARROW chains (project/filter/generate/
    * alias) over a single file scan: the scan's size in bytes, from
    * catalog/file-listing metadata only. `None` for anything wider — a
    * shuffle upstream already redistributes to shuffle.partitions, and
    * local/in-memory relations have no file size. Never touches
    * `Dataset.rdd`, so nothing is materialized (with AQE, `df.rdd`
    * executes all upstream query stages at plan-build time).
    */
  def narrowScanSizeBytes(df: Dataset[Row]): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    def walk(p: LogicalPlan): Option[Long] = p match {
      case Project(_, c)                    => walk(c)
      case Filter(_, c)                     => walk(c)
      case SubqueryAlias(_, c)              => walk(c)
      case Generate(_, _, _, _, _, c)       => walk(c)
      // a Union of narrow scan children is still narrow (each child's
      // partitions pass through unshuffled): sum the child scan sizes so
      // e.g. a union of two small scans still gets spread before
      // CPU-heavy hash/shingle work
      case Union(children, _, _) =>
        val sizes = children.map(walk)
        if (sizes.forall(_.isDefined)) Some(sizes.flatten.sum) else None
      case lr: LogicalRelation              => Some(lr.relation.sizeInBytes)
      // an in-memory literal relation (fixture rows unioned onto a scan)
      // must not make the whole union opaque — its size is known exactly
      case loc: LocalRelation               => Some(loc.stats.sizeInBytes.toLong)
      case _                                => None
    }
    walk(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.analyzed)
  }

  /** The session's `spark.sql.files.maxPartitionBytes`. */
  def maxPartitionBytes(df: Dataset[Row]): Long =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .sparkSession.sessionState.conf.filesMaxPartitionBytes
}
