package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Morton (Z-order) interleave of the low
  * 32 bits of two longs — `a` on even result bits, `b` on odd. The
  * kernel behind multi-dimensional data layout: rows sorted by Z-value
  * cluster on BOTH dimensions at once, so parquet min/max footer stats
  * prune files for predicates on either column (the data-skipping
  * lever that matters at 100 TB, where a scan you skip is the cheapest
  * scan there is).
  *
  * A native expression (not a UDF, not a 64-term expression tree)
  * because the magic-number bit spread is 12 shift/mask ops that
  * inline straight into WholeStageCodegen; the equivalent built-in
  * expression tree is ~64 shiftright/and/or nodes that defeat codegen
  * method-size limits when composed, and a Scala UDF boxes both longs
  * per row. Interpreted eval mirrors the generated code bit-for-bit.
  * Null if either input is null. */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  // ImplicitCastInputTypes would be the idiomatic widening hook, but
  // its AbstractDataType signature is private[sql]; the SQL function
  // registration (GraftExtensions) widens integral args to long
  // instead, and Layout.zvalue casts on the Column path
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_interleave requires (bigint, bigint), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_interleave"

  @inline private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |long $x = $a & 0xFFFFFFFFL;
         |$x = ($x | ($x << 16)) & 0x0000FFFF0000FFFFL;
         |$x = ($x | ($x << 8)) & 0x00FF00FF00FF00FFL;
         |$x = ($x | ($x << 4)) & 0x0F0F0F0F0F0F0F0FL;
         |$x = ($x | ($x << 2)) & 0x3333333333333333L;
         |$x = ($x | ($x << 1)) & 0x5555555555555555L;
         |long $y = $b & 0xFFFFFFFFL;
         |$y = ($y | ($y << 16)) & 0x0000FFFF0000FFFFL;
         |$y = ($y | ($y << 8)) & 0x00FF00FF00FF00FFL;
         |$y = ($y | ($y << 4)) & 0x0F0F0F0F0F0F0F0FL;
         |$y = ($y | ($y << 2)) & 0x3333333333333333L;
         |$y = ($y | ($y << 1)) & 0x5555555555555555L;
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}
