package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode NFC normalization (`graft_nfc`) — canonical
  * composition before any text fingerprinting/dedup pass, so that
  * `e` + COMBINING ACUTE and precomposed `é` hash identically. Spark
  * ships no normalizer function (the usual fallback is a Scala UDF —
  * serialization + interpretation per row); this expression stays
  * inside whole-stage codegen and short-circuits the two overwhelmingly
  * common cases without allocating: pure-ASCII input (NFC is identity —
  * the original UTF8String is returned as-is) and already-normalized
  * input (`Normalizer.isNormalized` is a cheap scan). DuckDB's
  * `nfc_normalize` implements the same Unicode standard — the oracle
  * for the `text_normalize` gate.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_nfc expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static entry point shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path: no byte has the high bit set -> NFC is identity;
    // return the input buffer itself, zero allocation
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) {
        val str = s.toString
        return if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
        else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }

  def nfc(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
