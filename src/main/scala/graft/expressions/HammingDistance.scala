package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: Hamming distance between two packed
  * sign-bit columns (array<bigint> words from Quantize.binarySign) —
  * Σ popcount(a_w XOR b_w), with full whole-stage codegen.
  *
  * The binary-ANN candidate scan evaluates this once per
  * (query, corpus) pair; the HOF form (zip_with + aggregate) boxes
  * each word into java.lang.Long and re-enters the interpreter per
  * element, which made the "compact" binary scan slower than the
  * native-dot exact scan it is supposed to undercut (measured ~2x on
  * a 5x50k pair probe). This expression inlines
  * Long.bitCount(a ^ b) into the generated loop — the xor/popcnt
  * kernel a binary index actually runs, at memory bandwidth.
  *
  * Word-count mismatch → min-length prefix (same convention as
  * [[DotProduct]]). Null in → null out — including a null ELEMENT
  * inside either array's compared prefix: the zip_with/aggregate HOF
  * form this expression claims bit-parity with propagates an element
  * null into the whole sum, and graft_hamming is a registered SQL
  * function, so arbitrary arrays (not just binarySign output, which
  * never holds null slots) can reach it. Reading a null slot via
  * getLong would silently yield an arbitrary word instead. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hamming requires two array<bigint> arguments, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hamming"
  // a non-null pair can still produce null (null element in a compared
  // slot), so nullability must not collapse to the children's
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var hd = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      hd += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    hd
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val hd = ctx.freshName("hd")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $hd = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $hd += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $hd;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
