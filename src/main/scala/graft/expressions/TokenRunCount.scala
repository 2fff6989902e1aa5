package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the number of word tokens in a string —
  * bit-equal to `size(TextAnalysis.tokens(c))` without ever
  * materializing the token ARRAY (the HOF form lowercases, regex-splits
  * and allocates one UTF8String per token per row just to count them;
  * this scans the raw bytes once, no allocation, inlined into
  * WholeStageCodegen).
  *
  * Equivalence: `tokens` lowercases then splits on `[^a-z0-9]+`, so a
  * token boundary in the ORIGINAL text is exactly a maximal run of
  * ASCII alphanumerics — ASCII uppercase lowers into the kept class,
  * every other character (punctuation, whitespace, and all non-ASCII,
  * whose lowercase forms are still non-ASCII) lowers into a separator.
  * Multi-byte UTF-8 continuation/lead bytes are ≥ 0x80 and can never
  * read as ASCII alnum, so byte scanning needs no decoding.
  * Null in → null out. */
case class TokenRunCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_token_count requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var count = 0
    var inRun = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val alnum = (b >= '0' && b <= '9') || (b >= 'a' && b <= 'z') ||
        (b >= 'A' && b <= 'Z')
      if (alnum && !inRun) count += 1
      inRun = alnum
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val cnt = ctx.freshName("cnt")
      val inRun = ctx.freshName("inRun")
      val alnum = ctx.freshName("alnum")
      s"""
         |int $n = $c.numBytes();
         |int $cnt = 0;
         |boolean $inRun = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $b = $c.getByte($i);
         |  boolean $alnum = ($b >= (byte) '0' && $b <= (byte) '9') ||
         |    ($b >= (byte) 'a' && $b <= (byte) 'z') ||
         |    ($b >= (byte) 'A' && $b <= (byte) 'Z');
         |  if ($alnum && !$inRun) $cnt++;
         |  $inRun = $alnum;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenRunCount =
    copy(child = newChild)
}
