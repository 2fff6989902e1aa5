package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[CharEntropy]] — top-level object (no companion
  * class) so generated Java calls it as a plain static.
  *
  * Shannon entropy over the CODEPOINT distribution of a string, with
  * the exact float contract of the original column-expression form
  * (and of the DuckDB oracle that replays it): p(c) = count(c)/len as
  * one double division, the Σ p·ln(p) fold runs LEFT-ASSOCIATED in
  * ascending codepoint order (UTF-8 byte order ≡ codepoint order for
  * single codepoints), and the result is `0.0 − Σ` — never unary
  * minus — so the all-one-char case lands on +0.0. Empty → 0.0.
  *
  * One pass over the string + a TreeMap of distinct codepoints:
  * O(L + D·log D) per row, replacing the O(L²·D) expression chain
  * (per-codepoint substr materialization × per-distinct re-scan) that
  * measured 162 s across sf0.1 — a >400× hot-kernel rewrite with
  * bit-identical output. */
object CharEntropyKernel {
  def entropy(s: UTF8String): Double = {
    val j = s.toString
    val n = j.codePointCount(0, j.length)
    if (n == 0) return 0.0
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    while (i < j.length) {
      val cp = j.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      acc += p * math.log(p)
    }
    0.0 - acc
  }
}

/** Native Catalyst expression: character-level Shannon entropy — the
  * base64/hex/spam quality signal. Single static call inside
  * WholeStageCodegen; null in → null out (the column wrapper in
  * [[graft.ops.TextAnalysis.charEntropy]] coalesces nulls to empty
  * first, preserving the original null → 0.0 contract). */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyKernel.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CharEntropyKernel.entropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
