package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[NfcNormalize]] — a top-level object (no companion
  * class) so the Scala compiler emits a plain static method the
  * generated Java can call as `graft.expressions.NfcKernel.nfc(...)`.
  *
  * Unicode NFC canonical composition via `java.text.Normalizer`
  * (the JDK's ICU-derived implementation of UAX #15 — the same
  * algorithm behind DuckDB's utf8proc `nfc_normalize`, so the two
  * engines agree on every conformant input). Two fast paths keep the
  * 100 TB common case allocation-free:
  *
  *   1. pure-ASCII strings (numBytes == numChars) are NFC by
  *      construction — return the input UTF8String untouched;
  *   2. already-normalized non-ASCII strings (the overwhelming
  *      majority of real crawl text) pass `Normalizer.isNormalized`,
  *      a scan that allocates nothing — again return the input.
  *
  * Only genuinely decomposed text pays for the String round-trip. */
object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) s // single-byte chars only => ASCII => NFC
    else {
      val j = s.toString
      if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
    }
  }
}

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the canonical first step of every web-corpus cleaning
  * pipeline (decomposed "e" + U+0301 and composed "é" must fingerprint,
  * tokenize, and dedup identically). Spark has no built-in for this;
  * a Scala UDF would box every row and break whole-stage codegen, so
  * this is a unary expression whose generated code is a single static
  * call into [[NfcKernel]] — stays inside the codegen stage, no
  * serialization, and the ASCII fast path never allocates.
  * Null in → null out. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
