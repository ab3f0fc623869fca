package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftBridge}

/** Native codegen'd IVF cluster assignment: the id of the max-cosine
  * centroid (ties to the lowest id) for one vector against a broadcast
  * centroid array — `argmax_j dot(vec, centv_j)`.
  *
  * Replaces the `array_max(transform(cs, struct(dot, -cid)))` fold, whose
  * lambda is interpreted PER CENTROID PER ROW: at 1B vectors x nCentroids
  * x dim that constant factor is the whole assignment job. This
  * expression is one fused primitive loop inside whole-stage codegen —
  * no struct allocation, no per-element boxing, no comparisons beyond a
  * running (sim, cid) pair.
  *
  * Ordering is IDENTICAL to the struct-max formulation: doubles compare
  * with NaN greatest (Spark's ordering), sims tie to the lowest cid, and
  * the result is order-independent, so the nondeterministic collect_list
  * order of the centroid array cannot change the winner. Dot products
  * are the same sequential left-to-right sum as [[DotProduct]].
  *
  * Input: (vec array<double>, centroids array<struct<cid: long,
  * centv: array<double>>>). Null vec or null/empty centroid array ->
  * null. Degenerate entries (null element, null centv, null cid —
  * reachable through the SQL registration) resolve exactly as the HOF
  * does under null-fields-smallest struct ordering: null sims lose to
  * any computed sim, only-null-sim arrays yield the lowest non-null
  * cid, and an all-null-field winner yields NULL — never an NPE.
  */
case class CentroidArgmax(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _),
          ArrayType(StructType(Array(f0, f1)), _))
      if f0.dataType == LongType && f1.dataType.isInstanceOf[ArrayType]
        && f1.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_centroid_argmax expects (array<double>, array<struct<long, array<double>>>), got $l and $r")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_centroid_argmax"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val m = cs.numElements()
    if (m == 0) return null
    // Mirrors array_max over struct(sim, -cid) with Spark's null-fields-
    // smallest struct ordering, so degenerate SQL inputs (null array
    // elements, null centv, null cid) return what the HOF reference
    // returns instead of NPE-ing: a null element or null centv makes a
    // null sim that loses to ANY computed sim; among only-null-sim
    // candidates the lowest non-null cid wins; an all-null-field winner
    // yields NULL.
    var bestSim = 0.0d
    var bestCid = 0L
    var bestCidNull = false
    var found = false
    var nullSimCid = Long.MaxValue
    var haveNullSimCid = false
    var haveNullSimAny = false
    var j = 0
    while (j < m) {
      if (cs.isNullAt(j)) haveNullSimAny = true
      else {
        val row = cs.getStruct(j, 2)
        val cidNull = row.isNullAt(0)
        val cid = if (cidNull) 0L else row.getLong(0)
        if (row.isNullAt(1)) {
          haveNullSimAny = true
          if (!cidNull && cid < nullSimCid) { nullSimCid = cid; haveNullSimCid = true }
        } else {
          val cv = row.getArray(1)
          val n = math.min(v.numElements(), cv.numElements())
          var sim = 0.0
          var i = 0
          while (i < n) { sim += v.getDouble(i) * cv.getDouble(i); i += 1 }
          // Double.compare: NaN greatest, NaN == NaN -> cid tiebreak;
          // + 0.0 canonicalizes -0.0 (Spark treats -0.0 == 0.0). On sim
          // ties a null cid (negcid null = smallest) loses to any
          // non-null cid.
          val s2 = sim + 0.0d
          val cmp = if (found) java.lang.Double.compare(s2, bestSim) else 1
          val better = cmp > 0 || (cmp == 0 &&
            ((bestCidNull && !cidNull) || (!bestCidNull && !cidNull && cid < bestCid)))
          if (better) { bestSim = s2; bestCid = cid; bestCidNull = cidNull; found = true }
        }
      }
      j += 1
    }
    if (found) { if (bestCidNull) null else bestCid }
    else if (haveNullSimCid) nullSimCid
    else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sim = ctx.freshName("sim")
      val row = ctx.freshName("row")
      val cv = ctx.freshName("cv")
      val cid = ctx.freshName("cid")
      val bestSim = ctx.freshName("bestSim")
      val bestCid = ctx.freshName("bestCid")
      val found = ctx.freshName("found")
      val s2 = ctx.freshName("s2")
      val cmp = ctx.freshName("cmp")
      val nullSimCid = ctx.freshName("nullSimCid")
      s"""
         |int $m = $b.numElements();
         |if ($m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $bestSim = 0.0;
         |  long $bestCid = 0L;
         |  boolean ${bestCid}Null = false;
         |  boolean $found = false;
         |  long ${nullSimCid} = Long.MAX_VALUE;
         |  boolean ${nullSimCid}Have = false;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($b.isNullAt($j)) continue;
         |    org.apache.spark.sql.catalyst.InternalRow $row = $b.getStruct($j, 2);
         |    boolean ${cid}Null = $row.isNullAt(0);
         |    long $cid = ${cid}Null ? 0L : $row.getLong(0);
         |    if ($row.isNullAt(1)) {
         |      // null centv -> null sim: loses to any computed sim; among
         |      // only-null-sim candidates the lowest non-null cid wins
         |      if (!${cid}Null && $cid < $nullSimCid) {
         |        $nullSimCid = $cid; ${nullSimCid}Have = true;
         |      }
         |      continue;
         |    }
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv = $row.getArray(1);
         |    int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
         |    double $sim = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $sim += $a.getDouble($i) * $cv.getDouble($i);
         |    }
         |    // Double.compare: NaN greatest, NaN == NaN -> cid tiebreak;
         |    // + 0.0 canonicalizes -0.0 (Spark treats -0.0 == 0.0); a
         |    // null cid loses sim-ties to any non-null cid
         |    double $s2 = $sim + 0.0;
         |    int $cmp = $found ? Double.compare($s2, $bestSim) : 1;
         |    if ($cmp > 0 || ($cmp == 0 &&
         |        ((${bestCid}Null && !${cid}Null) ||
         |         (!${bestCid}Null && !${cid}Null && $cid < $bestCid)))) {
         |      $bestSim = $s2; $bestCid = $cid; ${bestCid}Null = ${cid}Null; $found = true;
         |    }
         |  }
         |  if ($found) {
         |    if (${bestCid}Null) { ${ev.isNull} = true; } else { ${ev.value} = $bestCid; }
         |  } else if (${nullSimCid}Have) {
         |    ${ev.value} = $nullSimCid;
         |  } else {
         |    ${ev.isNull} = true;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CentroidArgmax =
    copy(left = newLeft, right = newRight)
}

object CentroidArgmax {
  /** Column-level entry point (no session required). */
  def argmax(vec: Column, centroids: Column): Column =
    GraftBridge.column(CentroidArgmax(
      GraftBridge.expression(vec), GraftBridge.expression(centroids)))
}
