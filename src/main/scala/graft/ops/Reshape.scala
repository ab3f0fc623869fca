package graft.ops

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** Wide-table reshaping: pivot and salted joins.
  *
  * Both exist to keep well-known scale hazards out of user code: pivot
  * without an explicit value list makes Spark run a separate
  * distinct-scan job over the pivot column (a full extra pass at
  * 100 TB), and a skewed equi-join funnels a hot key's rows through one
  * reducer.
  */
object Reshape {

  /** Pivot `pivotCol` into one count column per value in `values`.
    * The value list is REQUIRED: an explicit list keeps the plan to one
    * aggregation pass (map-side partial agg included); omitting it would
    * trigger Spark's hidden distinct-values job first. Missing
    * (group, value) combinations surface as 0, not null, matching the
    * SQL `count(*) FILTER (...)` formulation.
    */
  def pivotCounts(df: DataFrame, groupCol: String, pivotCol: String,
                  values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "explicit pivot values required (scale: avoids a distinct-scan job)")
    val pivoted = df.groupBy(col(groupCol))
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
    values.foldLeft(pivoted)((d, v) =>
      d.withColumn(v, coalesce(col(s"`$v`"), lit(0L))))
  }

  /** Per-group top-N rows by `orderCol` descending (ties by `tieCol`
    * ascending): the two-stage salted formulation — stage 1 takes the
    * local top-N inside each (group, salt) slice so no task ever sorts
    * a whole hot group; stage 2 merges the <= nSalts*N survivors.
    * A single `Window.partitionBy(group)` would funnel every row of the
    * biggest group through one task — the skew this replaces (same
    * design as the similarity top-k merge).
    */
  def topNPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
                   tieCol: String, n: Int, nSalts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("_salt", pmod(hash(col(tieCol)), lit(nSalts)))
    val w1 = Window.partitionBy((groupCols.map(col) :+ col("_salt")): _*)
      .orderBy(col(orderCol).desc, col(tieCol).asc)
    val partial = salted.withColumn("_r", row_number().over(w1))
      .filter(col("_r") <= n).drop("_r", "_salt")
    val w2 = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol).asc)
    partial.withColumn("rk", row_number().over(w2)).filter(col("rk") <= n)
  }

  /** Skew-defeating salted equi-join: the LEFT side gets a
    * deterministic salt in [0, nSalts) from a hash of its key + row
    * content, the RIGHT side is replicated once per salt, and the join
    * runs on (key, salt) — a hot left key's rows spread over nSalts
    * reducers instead of one. Results are EXACTLY the plain join's
    * (each left row meets each matching right row once, at the left
    * row's own salt) — proven by the oracle query, whose SQL is the
    * unsalted join.
    *
    * Cost: right side is shuffled nSalts times over — use for
    * skewed-fact ⋈ modest-dimension joins (the classic case), not for
    * two huge sides. AQE's runtime skew splitting handles the
    * in-between cases; this is the explicit tool for keys so hot a
    * single AQE split still won't fit.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String, nSalts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    // right/full outer would null-extend each unmatched REPLICATED right
    // row — nSalts spurious output rows per unmatched right key. Only
    // join types where unmatched right copies silently drop are sound.
    val ok = Set("inner", "left", "left_outer", "leftouter", "semi",
      "left_semi", "leftsemi", "anti", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left/semi/anti join types, got '$joinType' " +
        "(right/full would duplicate unmatched right rows once per salt)")
    val l = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toSeq: _*), lit(nSalts)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("_salt") === r("_salt"), joinType)
      .drop(l("_salt")).drop(r("_salt"))
  }
}
