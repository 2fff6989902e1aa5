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
  * and every other character lowers into a separator, with exactly two
  * Unicode exceptions whose lowercase forms re-enter ASCII:
  *   - U+212A KELVIN SIGN (bytes E2 84 AA) lowers to 'k': a token
  *     character (starts or continues a run);
  *   - U+0130 LATIN CAPITAL I WITH DOT (bytes C4 B0) lowers to 'i'
  *     followed by combining U+0307 (a separator): it starts a token
  *     if outside a run, then ends the run.
  * Both sequences are matched explicitly below. All other multi-byte
  * UTF-8 lead/continuation bytes are ≥ 0x80, never read as ASCII
  * alnum, and lowercase to non-ASCII, so the rest of the scan needs no
  * decoding. Null in → null out. */
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
      if (b == 0xE2.toByte && i + 2 < n && s.getByte(i + 1) == 0x84.toByte &&
          s.getByte(i + 2) == 0xAA.toByte) { // U+212A KELVIN → 'k'
        if (!inRun) count += 1
        inRun = true
        i += 3
      } else if (b == 0xC4.toByte && i + 1 < n &&
          s.getByte(i + 1) == 0xB0.toByte) { // U+0130 'İ' → 'i' + U+0307
        if (!inRun) count += 1
        inRun = false
        i += 2
      } else {
        val alnum = (b >= '0' && b <= '9') || (b >= 'a' && b <= 'z') ||
          (b >= 'A' && b <= 'Z')
        if (alnum && !inRun) count += 1
        inRun = alnum
        i += 1
      }
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
         |int $i = 0;
         |while ($i < $n) {
         |  byte $b = $c.getByte($i);
         |  if ($b == (byte) 0xE2 && $i + 2 < $n &&
         |      $c.getByte($i + 1) == (byte) 0x84 &&
         |      $c.getByte($i + 2) == (byte) 0xAA) {
         |    if (!$inRun) $cnt++;
         |    $inRun = true;
         |    $i += 3;
         |  } else if ($b == (byte) 0xC4 && $i + 1 < $n &&
         |      $c.getByte($i + 1) == (byte) 0xB0) {
         |    if (!$inRun) $cnt++;
         |    $inRun = false;
         |    $i += 2;
         |  } else {
         |    boolean $alnum = ($b >= (byte) '0' && $b <= (byte) '9') ||
         |      ($b >= (byte) 'a' && $b <= (byte) 'z') ||
         |      ($b >= (byte) 'A' && $b <= (byte) 'Z');
         |    if ($alnum && !$inRun) $cnt++;
         |    $inRun = $alnum;
         |    $i++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenRunCount =
    copy(child = newChild)
}
