package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's dotted path language (T1, src/main/etl.js:35-75),
  * compiled to `Column` expression trees.
  *
  * Token kinds:
  *  - `name`   — field navigation (dotted)
  *  - `$`      — re-anchor at the message ROOT (correlated access from a
  *               nested/array scope, src/main/etl.js:47-49)
  *  - `#`      — the current array element's own index (src/main/etl.js:56-59)
  *  - `#name`  — `data[name].length`; must be the terminal token and `name`
  *               must hold an array (src/main/etl.js:50-55, errors at :44-46,
  *               :52-53)
  *
  * Compilation is pure `Column` composition — no Catalyst internals — so
  * paths stay inside whole-stage codegen and Catalyst prunes the parquet
  * scan down to exactly the navigated fields.
  */
object PathExpr {

  /** Evaluation scope: `root` is the whole pre-explode row (carried as a
    * struct column through explode — the subtle `$`-correlation of SURVEY
    * §7 step 3), `current` is the local element, `index` its position from
    * `posexplode`/`transform((x,i)=>…)`.
    */
  final case class Scope(root: Column, current: Column, index: Option[Column] = None)

  def compile(path: String, scope: Scope): Column = {
    val tokens = path.split("\\.", -1).toList
    require(tokens.nonEmpty && tokens.forall(_.nonEmpty), s"bad path: '$path'")
    walk(tokens, scope.current, scope)
  }

  private def walk(tokens: List[String], cur: Column, scope: Scope): Column = tokens match {
    case Nil => cur
    case "$" :: rest => walk(rest, scope.root, scope)
    case "#" :: rest =>
      require(rest.isEmpty, s"'#' must be the last path token") // etl.js:44-46
      scope.index.getOrElse(
        throw new IllegalArgumentException("'#' used outside an array-map scope"))
    case t :: rest if t.startsWith("#") =>
      require(rest.isEmpty, s"'#name' must be the last path token") // etl.js:44-46
      size(field(cur, t.substring(1))) // length of array, etl.js:50-55
    case t :: rest => walk(rest, field(cur, t), scope)
  }

  /** Navigate one field whether `cur` is a named top-level scope or a
    * struct column. Numeric segments index into arrays (0-based, matching
    * the reference's JS array semantics in `apply`, src/main/etl.js:683-697).
    */
  private def field(cur: Column, name: String): Column =
    if (name.forall(_.isDigit)) element_at(cur, name.toInt + 1)
    else cur.getField(name)

  /** Top-level scope for a DataFrame: root = current = the whole row as a
    * struct of all columns.
    */
  def rowScope(columns: Seq[String]): Scope = {
    val row = struct(columns.map(col): _*)
    Scope(root = row, current = row)
  }
}
