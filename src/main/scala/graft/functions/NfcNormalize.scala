package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonicalization
  * step a multilingual dedup pipeline needs before hashing: composed vs
  * decomposed forms ("é" vs "e"+U+0301) are byte-different, so exact dedup
  * by md5(text) silently misses duplicates that differ only in encoding
  * form. The JDK Normalizer is the implementation; `isNormalized` gives a
  * cheap no-allocation fast path (true for all-ASCII, i.e. almost every
  * row of a typical corpus). Oracle side: DuckDB `nfc_normalize`.
  *
  * Codegen is a single static call, so the expression stays inside
  * whole-stage codegen spans (no lambda dispatch, no fallback). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** NFC of a UTF8String; returns the INPUT object unchanged when already
    * normalized. All-ASCII (almost every row of a typical corpus) short-
    * circuits on the byte check alone — no String decode, no allocation
    * (r11 review: the toString-first form allocated per row). */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
