package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.{Column, GraftBridge}

/** Native codegen'd LSH hyperplane-sign bucket
  * ([[graft.llm.Similarity.hyperplaneBucket]] semantics): bit p of the
  * result is set iff the dot product of the vector with deterministic
  * pseudo-random hyperplane p is >= 0. The hyperplane component for
  * (plane p, dim i) is the LCG step
  * `((p*64 + i) * 1103515245 + 12345) mod 2^31 / 2^31 - 0.5` — pure
  * integer arithmetic, reproducible in any engine, identical to the SQL
  * the oracle generates.
  *
  * The HOF formulation evaluates nPlanes interpreted
  * `aggregate(zip_with(...))` lambda chains per row; this expression is
  * one fused primitive loop inside whole-stage codegen. Numerics are
  * IDENTICAL (ascending-dimension sequential sum from 0.0 per plane).
  */
/** `firstPlane` offsets the plane index: table t of a multi-table
  * (OR-amplified) LSH uses planes [t*nPlanes, (t+1)*nPlanes) so the
  * tables hash with INDEPENDENT hyperplanes while sharing one
  * deterministic plane family.
  */
case class HyperplaneBucket(child: Expression, nPlanes: Int, firstPlane: Int = 0)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if nPlanes >= 1 && nPlanes <= 62 && firstPlane >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) if nPlanes < 1 || nPlanes > 62 =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_hyperplane_bucket nPlanes must be in [1,62], got $nPlanes")
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_bucket firstPlane must be >= 0, got $firstPlane")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_bucket expects array<double>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    require(n < 4096,
      s"hyperplane bucket supports vectors under 4096 dims (stride bound), got $n")
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val seed = ((firstPlane + p).toLong * 4096L + i) * 1103515245L + 12345L
        acc += v.getDouble(i) * ((seed % 2147483648L).toDouble / 2147483648.0d - 0.5d)
        i += 1
      }
      if (acc >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val seed = ctx.freshName("seed")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $v.numElements();
         |if ($n >= 4096) {
         |  throw new IllegalArgumentException(
         |    "hyperplane bucket supports vectors under 4096 dims (stride bound), got " + $n);
         |}
         |long $bucket = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $seed = ((long) ($firstPlane + $p) * 4096L + $i) * 1103515245L + 12345L;
         |    $acc += $v.getDouble($i) * (((double) ($seed % 2147483648L)) / 2147483648.0D - 0.5D);
         |  }
         |  if ($acc >= 0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  def bucket(v: Column, nPlanes: Int, firstPlane: Int = 0): Column =
    GraftBridge.column(HyperplaneBucket(GraftBridge.expression(v), nPlanes, firstPlane))
}
