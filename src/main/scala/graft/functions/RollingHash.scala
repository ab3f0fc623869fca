package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial rolling hash:
  * h = fold over code points (h0 = 7)((h, cp) => (h*131 + cp) mod 1e9+7).
  *
  * Replaces the HOF formulation `aggregate(split(s, ""), 7, ...)`, which
  * allocates one single-character UTF8String per input character and
  * interprets a lambda per fold step — the dominant cost of the
  * minhash/simhash/fingerprint family (millions of folds per corpus
  * pass). Values are identical: per-code-point iteration matches both
  * Spark's `split("")`+`ascii` and DuckDB's `string_split_regex(s, '')`
  * +`ascii` for all BMP text, including the empty-string case (one empty
  * token of codepoint 0).
  */
case class RollingHash(child: Expression, mult: Long = 131L) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_rolling_hash expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c, ${mult}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val P = 1000000007L

  /** Static entry point shared by interpreted eval and generated code.
    * `mult` selects the polynomial base — independent hash families come
    * from different bases (131 default, 137 for the simhash high bits).
    */
  def hash(s: UTF8String, mult: Long): Long = {
    val str = s.toString
    // split("") on an empty string yields one empty token whose ascii()
    // is 0 — reproduce that so hashes agree with the HOF/oracle forms
    if (str.isEmpty) return (7L * mult) % P
    var h = 7L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def hash(s: UTF8String): Long = hash(s, 131L)

  /** Scalar hash of a numeric id — THE stream-routing / admission-key
    * recipe, equal by construction to the batch operators' column form
    * `rollingHash(col(id).cast("string"))`. Every streaming twin keys
    * on this ONE definition (quota admission, pack streams, batch
    * assembly) so stream-vs-batch key parity is a single contract, not
    * a per-site incantation.
    */
  def hashId(id: Long): Long = hash(UTF8String.fromString(id.toString), 131L)

  def hash(c: Column): Column = hash(c, 131L)

  def hash(c: Column, mult: Long): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c), mult))
}
