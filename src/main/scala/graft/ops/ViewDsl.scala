package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The view-query DSL (SURVEY §2.4, §3.1): a nested tree over registered
  * models with equality `where` filters, required/optional children, and
  * `unique` (at-most-one-match) semantics — the reference compiles the same
  * tree to Sequelize `{model, include:[…]}` and lets MySQL execute
  * (src/main/etl.js:28-33,472-491). Here the tree compiles directly to a
  * Spark logical plan: scan -> filter -> join chain, and Catalyst supplies
  * pushdown, pruning, and join selection.
  *
  * Scale design:
  *  - equality `where` filters are authored at the scan (pushed into
  *    parquet as `PushedFilters`);
  *  - `broadcast=true` children (dimension lookups — the reference's every
  *    `include` is one) hash-join without a shuffle of the fact side;
  *  - `unique` dedup runs on the (small) child BEFORE the join, never on
  *    the joined fact table;
  *  - `nest` (hasMany result shaping, src/main/etl.js:482-487) is a single
  *    shuffle on the parent key with map-side partial aggregation.
  */
object ViewDsl {

  /** C10 naming convention: lower-case the FIRST letter only (the
    * reference's `name.charAt(0).toLowerCase() + name.substring(1)`,
    * src/main/etl.js:163,479,483) — not the whole string.
    */
  def lowerFirst(name: String): String =
    if (name.isEmpty) name else name.head.toLower +: name.tail

  sealed trait AssocKind
  case object BelongsTo extends AssocKind // N:1 — child struct, J4
  case object HasMany   extends AssocKind // 1:N — nested list, J3

  /** FK association: parent.parentKey = child.childKey. */
  final case class Assoc(parentKey: String, childKey: String, kind: AssocKind)

  final case class ViewNode(
      model: String,
      where: Seq[(String, Any)] = Seq.empty,   // F6 equality predicates
      required: Boolean = false,               // J1 inner vs J2 left_outer
      unique: Boolean = false,                 // J7 at-most-one-match
      broadcast: Boolean = false,              // physical hint for dim tables
      assoc: Option[Assoc] = None,             // edge to the PARENT node
      nest: Boolean = false,                   // hasMany: collect children as array
      columns: Seq[String] = Seq.empty,        // projection (empty = all)
      children: Seq[ViewNode] = Seq.empty,
      // cap on nested children collected per parent (None = unbounded).
      // `nest`'s collect_list builds an IN-MEMORY array per parent — a
      // hot parent with millions of children OOMs the aggregating task
      // (arrays, unlike sorts, cannot spill). The cap pre-ranks children
      // per key (row_number, which DOES spill its sort) and keeps the
      // first maxNest by the child's column order — bounding the array.
      maxNest: Option[Int] = None)

  /** Model registry: name -> DataFrame. Views are `$`-parameterized
    * functions returning a ViewNode tree (registerView,
    * src/main/etl.js:185-189) — in Scala, ordinary functions
    * `Map[String,Any] => ViewNode`.
    */
  final class Registry(models: Map[String, DataFrame]) {
    def model(name: String): DataFrame = models.getOrElse(name,
      throw new IllegalArgumentException(s"unregistered model: $name"))

    /** Top-level `unique` is the reference's findOne — at most ONE row
      * for the whole query (src/main/etl.js:477-480); child-level
      * `unique` is per-join-key (handled in compile). The reference
      * takes whatever row the DB returns first; `limit(1)` preserves
      * that contract (callers needing determinism should order first).
      */
    def applyView(node: ViewNode): DataFrame = {
      val out = compile(node)
      if (node.unique) out.limit(1) else out
    }

    private def scan(node: ViewNode): DataFrame = {
      var df = model(node.model)
      // author filters at the scan so Catalyst pushes them into parquet
      node.where.foreach { case (c, v) => df = df.filter(col(c) === lit(v)) }
      if (node.columns.nonEmpty) df = df.select(node.columns.map(col): _*)
      df
    }

    /** Deterministic child orderings (unique, maxNest, nest's array_sort)
      * sort by the child's columns: fail with a named-column message
      * instead of an opaque Catalyst analysis error when one is not
      * orderable (map type).
      */
    private def requireOrderable(childDf: DataFrame, cols: Seq[String],
                                 model: String, feature: String): Unit = {
      val unorderable = cols.filter(c =>
        !org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(childDf.schema(c).dataType))
      require(unorderable.isEmpty,
        s"$feature on $model: column(s) ${unorderable.mkString(", ")} are not " +
          s"orderable (e.g. map type) — project them out or drop $feature")
    }

    private def compile(node: ViewNode): DataFrame = {
      val base = scan(node)
      node.children.foldLeft(base) { (parentDf, child) =>
        val a = child.assoc.getOrElse(throw new IllegalArgumentException(
          s"child ${child.model} lacks an association to ${node.model}"))
        var childDf = compile(child)
        if (child.unique) {
          // enforce <=1 match on the child side BEFORE joining (J7):
          // row_number over the join key — cheap, child is the small side
          requireOrderable(childDf, childDf.columns.toSeq, child.model, "unique")
          val w = Window.partitionBy(col(a.childKey)).orderBy(childDf.columns.map(col): _*)
          childDf = childDf.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1).drop("_rn")
        }
        val joinType = if (child.required) "inner" else "left_outer"
        a.kind match {
          case BelongsTo =>
            val rhs = if (child.broadcast) broadcast(childDf) else childDf
            // drop the child-side join key after the join: keeping both
            // copies makes every later col(key) reference ambiguous
            parentDf.join(rhs, parentDf(a.parentKey) === rhs(a.childKey), joinType)
              .drop(rhs(a.childKey))
          case HasMany if child.nest =>
            // reproduce the nested findAll result shape: one array-of-struct
            // column per parent key; array_sort for deterministic output
            val childCols = childDf.columns.filterNot(_ == a.childKey)
            // nest's array_sort compares the collected structs — same
            // orderability requirement as the cap's window sort
            requireOrderable(childDf, childCols.toSeq, child.model, "nest")
            val bounded = child.maxNest match {
              case None => childDf
              case Some(cap) =>
                // the pre-rank orders by every non-key child column; fail
                // with a clear message instead of an opaque analysis error
                // when that ordering is impossible (key-only projection ->
                // empty ORDER BY)
                require(childCols.nonEmpty,
                  s"maxNest on ${child.model}: child projects only the join key — " +
                    "keep at least one non-key column to order the capped rows by")
                val wc = Window.partitionBy(col(a.childKey))
                  .orderBy(childCols.map(col): _*)
                childDf.withColumn("_nrn", row_number().over(wc))
                  .filter(col("_nrn") <= cap).drop("_nrn")
            }
            val nested = bounded.groupBy(col(a.childKey))
              .agg(array_sort(collect_list(struct(childCols.map(col): _*)))
                .as(lowerFirst(child.model) + "s"))
            parentDf.join(nested, parentDf(a.parentKey) === nested(a.childKey), joinType)
              .drop(nested(a.childKey))
          case HasMany =>
            parentDf.join(childDf, parentDf(a.parentKey) === childDf(a.childKey), joinType)
        }
      }
    }

    /** Many-to-many `through` an edge table (J5,
      * src/test/examples/associations/EntityEntity.js:3-8): two chained
      * equi-joins via the edge model.
      */
    def manyToMany(left: String, through: String, right: String,
                   leftKey: String, throughLeft: String,
                   throughRight: String, rightKey: String): DataFrame = {
      val l = model(left); val e = model(through); val r = model(right)
      l.join(e, l(leftKey) === e(throughLeft))
        .join(r, e(throughRight) === r(rightKey))
    }
  }
}
