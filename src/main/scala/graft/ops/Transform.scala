package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative transform (T2, src/main/etl.js:324-405), inverse transform /
  * scatter (T3, src/main/etl.js:699-727), and defaults patch (T7,
  * src/main/etl.js:596-624,683-697) — all compiled to a single `select`.
  *
  * Spec language mirrors the reference:
  *  - `TPath(p)`                — project the leaf at path p (`[path]`)
  *  - `TNav(p, sub)`            — navigate to p then recurse (`[path, sub]`)
  *  - `TObj(fields)`            — nested object output
  *  - `TLit(v)`                 — constant column (src/main/etl.js:401-402)
  *  - `TArrMap(p, elem)`        — map over the array at p, injecting `$`
  *                                root and `#` index per element
  *                                (src/main/etl.js:348-379); compiled to the
  *                                higher-order `transform((x,i)=>…)` — stays
  *                                columnar, no explode/shuffle
  *  - `unique=true` on TArrMap  — scalar context: take the single element
  *                                (src/main/etl.js:368)
  */
object Transform {

  sealed trait TSpec
  final case class TPath(path: String) extends TSpec
  final case class TNav(path: String, spec: TSpec) extends TSpec
  final case class TObj(fields: Seq[(String, TSpec)]) extends TSpec
  final case class TLit(value: Any) extends TSpec
  final case class TArrMap(path: String, elem: TSpec, unique: Boolean = false) extends TSpec

  import PathExpr.Scope

  def compile(spec: TSpec, scope: Scope): Column = spec match {
    case TLit(v)     => lit(v)
    case TPath(p)    => PathExpr.compile(p, scope)
    case TNav(p, s)  =>
      val target = PathExpr.compile(p, scope)
      compile(s, scope.copy(current = target))
    case TObj(fs)    =>
      struct(fs.map { case (k, s) => compile(s, scope).as(k) }: _*)
    case TArrMap(p, elem, unique) =>
      val arr = PathExpr.compile(p, scope)
      if (unique) {
        // unique:true means the value is NOT an array — scalar
        // passthrough, the array-map is skipped entirely (the reference's
        // `if (!options.unique)` guard around the _.map, etl.js:368-379);
        // no `#` index exists in this context
        compile(elem, scope.copy(current = arr, index = None))
      } else {
        // `$` root survives into the lambda because `scope.root` is an
        // outer Column; `#` binds to the lambda index (0-based like JS).
        transform(arr, (x, i) => compile(elem, Scope(scope.root, x, Some(i))))
      }
  }

  /** applyTransform: top-level spec must be an object; one output column
    * per top-level key.
    */
  def applyTransform(df: DataFrame, spec: TObj): DataFrame = {
    val scope = PathExpr.rowScope(df.columns.toSeq)
    df.select(spec.fields.map { case (k, s) => compile(s, scope).as(k) }: _*)
  }

  /** Inverse transform / scatter (T3): for each source key, write its value
    * to one or several dotted target paths (multi-target = same source
    * Column aliased under several names, src/main/etl.js:709-711); target
    * `"."`-paths build nested structs. `identity = true` targets keep the
    * source name (src/main/etl.js:714-716).
    */
  def scatter(df: DataFrame, mapping: Seq[(String, Seq[String])]): DataFrame = {
    // Expand to (targetPath -> sourceColumn), then fold dotted targets into
    // nested structs grouped by their head segment.
    val pairs: Seq[(List[String], Column)] = for {
      (src, targets) <- mapping
      t <- targets
    } yield (t.split("\\.").toList, col(src))
    df.select(buildLevel(pairs): _*)
  }

  private def buildLevel(pairs: Seq[(List[String], Column)]): Seq[Column] = {
    val grouped = pairs.groupBy(_._1.head)
    // preserve first-appearance order
    pairs.map(_._1.head).distinct.map { head =>
      val group = grouped(head)
      val leaves  = group.filter(_._1.size == 1)
      val deeper  = group.filter(_._1.size > 1).map { case (p, c) => (p.tail, c) }
      if (deeper.isEmpty) leaves.head._2.as(head)
      else if (deeper.forall(_._1.head.forall(_.isDigit))) {
        // T3 numeric segments build ARRAYS by position (the reference's
        // `apply` creates intermediate arrays for numeric path parts,
        // src/main/etl.js:683-697); gaps become nulls
        val byIdx = deeper.map { case (p, c) => p.head.toInt -> (p.tail, c) }
        val elems = (0 to byIdx.map(_._1).max).map { i =>
          byIdx.filter(_._1 == i).map(_._2) match {
            case Seq() => lit(null)
            case Seq((Nil, c)) => c
            case sub => struct(buildLevel(sub): _*)
          }
        }
        array(elems: _*).as(head)
      }
      else struct(buildLevel(deeper): _*).as(head)
    }
  }

  /** Defaults patch (T7): deep-set `key -> value` ONLY if currently null
    * (the reference's only-if-absent assignment, src/main/etl.js:694-695).
    * Flat keys only here; nested via withField by callers.
    */
  def applyDefaults(df: DataFrame, defaults: Seq[(String, Any)]): DataFrame =
    defaults.foldLeft(df) { case (d, (k, v)) =>
      if (d.columns.contains(k)) d.withColumn(k, coalesce(col(k), lit(v)))
      else d.withColumn(k, lit(v))
    }
}
