package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: the bit length of a non-negative long —
  * `64 - numberOfLeadingZeros(v)`, with 0 for v = 0. Replaces the HLL
  * rank idiom `length(regexp_replace(bin(w), "^0+", ""))` (equivalently
  * `length(ltrim(bin(w), '0'))`), which per row renders a ≤64-char
  * binary STRING, runs a regex over it, and measures the remainder —
  * three allocations and a Matcher where one hardware LZCNT suffices.
  * Bit-exact: `bin(w)` of a positive long has no leading zeros, so its
  * length IS the bit length; for w = 0 the stripped string is empty →
  * length 0 = this expression's 0. Negative inputs take the same
  * two's-complement reading `bin` does (bit 63 set → 64); the HLL
  * callers mask to 48 bits so the case never arises there. */
case class BitLength64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bit_length64 requires a bigint argument, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bit_length64"

  override protected def nullSafeEval(input: Any): Any =
    64 - java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = 64 - java.lang.Long.numberOfLeadingZeros($c);")

  override protected def withNewChildInternal(newChild: Expression): BitLength64 =
    copy(child = newChild)
}
