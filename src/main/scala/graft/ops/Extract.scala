package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Enrichment ("extract", SURVEY §3.3, src/main/etl.js:729-756): each field
  * of the extract spec derives a new column, either from an expression over
  * already-present fields or from a LOOKUP against another table. Fields
  * may depend on each other — the reference resolves this with an implicit
  * promise DAG (`dollar`, src/main/etl.js:104-118); we topologically sort
  * the spec and emit staged `withColumn`s / joins.
  *
  * The big semantic upgrade over the reference: its extractors fire ONE
  * `findOne` RPC per field per row (the N+1 pattern, src/main/etl.js:
  * 746-753); ours compile to set-oriented LEFT OUTER equi-joins (J6) — one
  * broadcast join per lookup field for the whole batch, no per-row I/O.
  */
object Extract {

  sealed trait Extractor { def deps: Seq[String] }

  /** Derive via Column expression over the current row (incl. previously
    * extracted fields named in `deps`).
    */
  final case class ExprField(deps: Seq[String], make: DataFrame => Column) extends Extractor

  /** Lookup join: left-join `lookup` on `leftKey == rightKey`, take
    * `select` from the matched row. `unique` enforces <=1 match
    * (findOne semantics) via pre-join dedup on the lookup side.
    */
  final case class Lookup(
      lookup: DataFrame,
      leftKey: String,
      rightKey: String,
      select: Seq[(String, String)],  // (lookupCol -> outputName)
      unique: Boolean = true,
      broadcastHint: Boolean = true,
      deps: Seq[String] = Seq.empty) extends Extractor

  /** Topological sort by declared deps (Kahn); cycles are an error like the
    * reference's unresolvable promise chains.
    */
  private[graft] def toposort(spec: Seq[(String, Extractor)]): Seq[(String, Extractor)] = {
    val names = spec.map(_._1).toSet
    val remaining = scala.collection.mutable.LinkedHashMap(spec: _*)
    val done = scala.collection.mutable.LinkedHashSet.empty[String]
    val out = Seq.newBuilder[(String, Extractor)]
    while (remaining.nonEmpty) {
      val ready = remaining.filter { case (_, e) =>
        e.deps.forall(d => !names.contains(d) || done.contains(d))
      }
      require(ready.nonEmpty,
        s"extract dependency cycle among ${remaining.keys.mkString(", ")}")
      ready.foreach { case (k, e) => out += (k -> e); done += k; remaining -= k }
    }
    out.result()
  }

  def extract(df: DataFrame, spec: Seq[(String, Extractor)]): DataFrame =
    toposort(spec).foldLeft(df) {
      case (d, (name, ExprField(_, make))) => d.withColumn(name, make(d))
      case (d, (name, lk: Lookup)) =>
        // alias the join key to a reserved name FIRST, then the selected
        // outputs — so a user selecting the join key itself
        // (select = Seq(rightKey -> out)) can't rename it away from under
        // the join condition
        var rhs = lk.lookup.select(
          col(lk.rightKey).as("_gk") +:
            lk.select.map { case (c, o) => col(c).as(o) }: _*)
        if (lk.unique) {
          val w = Window.partitionBy(col("_gk")).orderBy(rhs.columns.map(col): _*)
          rhs = rhs.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1).drop("_rn")
        }
        val rhsHinted = if (lk.broadcastHint) broadcast(rhs) else rhs
        d.join(rhsHinted, d(lk.leftKey) === rhsHinted("_gk"), "left_outer")
          .drop("_gk")
    }
}
