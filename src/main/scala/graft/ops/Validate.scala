package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clause-based validation (F1/F2/F3, src/main/etl.js:77-102,407-470,
  * 645-673) and match/dispatch (F4/F5, src/main/etl.js:544-594).
  *
  * Semantics preserved from the reference: validation ANNOTATES rather than
  * drops — failures become boolean columns (the reference writes them into
  * `data._`, src/main/etl.js:452-469) and an aggregate failure count is
  * exposed via `Dataset.observe` (the reference's logging side-channel,
  * src/main/etl.js:651-653). Only `match` dispatch and load filters
  * actually discard rows.
  *
  * A validation spec leaf is an OR-list of clauses (a value passes if SOME
  * clause matches, src/main/etl.js:80-102): literal clause = strict
  * equality, `Absent` = optional (the `undefined` literal,
  * src/test/examples/person.js:11-13), predicate clause = a Column
  * expression (compiled native — regex/set/range shapes never become UDFs,
  * so they stay inside codegen).
  */
object Validate {

  sealed trait Clause
  final case class EqLit(value: Any) extends Clause
  case object Absent extends Clause
  final case class Pred(make: Column => Column) extends Clause

  type Spec = Seq[(String, Seq[Clause])]

  def clauseCol(c: Column, clause: Clause): Column = clause match {
    case EqLit(v) => c <=> lit(v)
    case Absent   => c.isNull
    case Pred(f)  => coalesce(f(c), lit(false))
  }

  /** Name-shape predicate from the reference's `isName`
    * (src/test/examples/person.js:2-4): single word, initial capital.
    */
  val isName: Clause = Pred(c => c.rlike("^\\w+$") && c === initcap(c))

  /** Add one `<field>_valid` boolean column per spec entry (OR over
    * clauses), plus `_valid` = conjunction. Rows are NOT dropped.
    */
  def validate(df: DataFrame, spec: Spec): DataFrame = {
    val withCols = spec.foldLeft(df) { case (d, (field, clauses)) =>
      val ok = clauses.map(cl => clauseCol(col(field), cl)).reduce(_ || _)
      d.withColumn(s"${field}_valid", ok)
    }
    val all = spec.map { case (f, _) => col(s"${f}_valid") }.reduce(_ && _)
    withCols.withColumn("_valid", all)
  }

  /** F2 array-element validation with index trails: each element of the
    * array column is checked against the clause OR-list; failures are
    * recorded as the element INDICES (the reference records failures
    * under dotted `field.<idx>` trails, src/main/etl.js:446-450).
    * Emits `<field>_elem_valid` (array<boolean>), `<field>_invalid_idx`
    * (array<int> of failing positions, 0-based) and `<field>_valid`
    * (forall). Pure higher-order functions — no explode, no shuffle.
    */
  def validateElements(df: DataFrame, field: String, clauses: Seq[Clause]): DataFrame = {
    val ok = (c: Column) => clauses.map(cl => clauseCol(c, cl)).reduce(_ || _)
    df.withColumn(s"${field}_elem_valid", transform(col(field), x => ok(x)))
      .withColumn(s"${field}_invalid_idx",
        filter(transform(col(field), (x, i) => when(!ok(x), i)), x => x.isNotNull))
      .withColumn(s"${field}_valid", forall(col(field), x => ok(x)))
  }

  /** The observe side-channel: emit a metric counting invalid rows without
    * an extra pass (replaces the reference's per-row logger,
    * src/main/etl.js:651-653).
    */
  def observed(df: DataFrame, name: String = "validation"): DataFrame =
    df.observe(name, count(when(!col("_valid"), 1)).as("invalid_rows"),
      count(lit(1)).as("total_rows"))

  // ---------------------------------------------------------------- match

  /** A registered mapping: match spec (metadata equality, `_.isMatch`
    * semantics src/main/etl.js:554-556) + the pipeline specs it bundles.
    */
  final case class Mapping(
      name: String,
      matchSpec: Seq[(String, Any)],
      validation: Spec = Seq.empty,
      defaults: Seq[(String, Any)] = Seq.empty)

  /** Row-level dispatch (F4): first registered mapping whose match spec
    * equals the row's metadata columns wins; no match -> null (the
    * reference throws, src/main/etl.js:560-562 — we annotate, callers
    * filter or fail on the observe metric).
    */
  def dispatch(df: DataFrame, mappings: Seq[Mapping]): DataFrame = {
    val route = mappings.foldLeft(lit(null).cast("string")) { (acc, m) =>
      val cond = m.matchSpec.map { case (k, v) => col(k) <=> lit(v) }.reduce(_ && _)
      // later registrations only fill rows still unmatched => first wins
      coalesce(acc, when(cond, lit(m.name)))
    }
    df.withColumn("_mapping", route)
  }

  /** Match-validate matrix (F5, src/main/etl.js:578-594): for each
    * key->clauses, a boolean column `<key>_failed` (true = NO clause
    * matched), reproducing execMatchValidate's failure map.
    */
  def matchValidate(df: DataFrame, spec: Spec, keep: Seq[String] = Nil): DataFrame =
    df.select(keep.map(col) ++ spec.map { case (field, clauses) =>
      val ok = clauses.map(cl => clauseCol(col(field), cl)).reduce(_ || _)
      (!ok).as(s"${field}_failed")
    }: _*)
}
