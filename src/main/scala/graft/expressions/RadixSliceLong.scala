package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: decode `len` digits of a fixed-radix
  * string starting at 1-based character position `pos` into a signed
  * 64-bit value — the allocation-free replacement for the pervasive
  * `conv(substring(h, pos, len), radix, 10).cast("long")` idiom over
  * md5 hex / `bin()` output (fingerprint gates, HLL registers,
  * deterministic samplers, FIM cuts, SimHash words).
  *
  * Why: `conv` routes through NumberConverter — a per-row UTF8String
  * slice, a byte-array copy, an unsigned decimal RENDER, and then a
  * string→long cast parse on top. Measured on the q169 register scan
  * (2.4M rows, 32 cores): the two conv/substring chains alone cost
  * more than the md5 they decode. This expression reads the source
  * bytes in place — no slice, no intermediate string — and folds
  * digits with `v = v*radix + d`, inlined into WholeStageCodegen.
  *
  * Semantics (the domain is ENGINE-PRODUCED digit strings, never user
  * data):
  *  - null in → null out;
  *  - characters beyond the end of the string are simply absent (the
  *    `substring` behavior): the slice is `[pos-1, min(pos-1+len, n))`;
  *  - an EMPTY slice decodes to null (conv("") is NULL);
  *  - digits accept '0'-'9', 'a'-'z', 'A'-'Z' up to the radix, exactly
  *    conv's alphabet; any other byte in the slice throws — the callers
  *    feed md5/bin output where that is impossible, and a loud error
  *    beats conv's silent longest-prefix salvage if that contract is
  *    ever broken.
  *  - at (radix 2, len 64) the fold wraps into the sign bit — the
  *    two's-complement word [[graft.ops.Dedup]] previously assembled
  *    from two 32-bit halves. Callers must keep radix^len within 63
  *    bits OR want exactly that wrap; `require`s below bound it.
  */
case class RadixSliceLong(child: Expression, pos: Int, len: Int, radix: Int)
    extends UnaryExpression {
  require(pos >= 1, s"pos is 1-based, got $pos")
  require(len >= 1, s"len must be >= 1, got $len")
  require(radix == 2 || radix == 16, s"radix must be 2 or 16, got $radix")
  // 16^15 < 2^63 (15 hex digits); 2^64 wraps by design (SimHash words)
  require(radix != 16 || len <= 15, s"hex len must be <= 15, got $len")
  require(radix != 2 || len <= 64, s"bin len must be <= 64, got $len")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_radix_slice_long requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_radix_slice_long"
  // an empty slice yields null even for non-null input
  override def nullable: Boolean = true

  @inline private def digit(b: Byte): Int = {
    val d =
      if (b >= '0' && b <= '9') b - '0'
      else if (b >= 'a' && b <= 'z') b - 'a' + 10
      else if (b >= 'A' && b <= 'Z') b - 'A' + 10
      else -1
    if (d < 0 || d >= radix)
      throw new IllegalArgumentException(
        s"graft_radix_slice_long(radix=$radix): invalid digit byte $b")
    d
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val start = pos - 1
    val end = math.min(start + len, n)
    if (start >= end) return null
    var acc = 0L
    var i = start
    while (i < end) { acc = acc * radix + digit(s.getByte(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val s = childGen.value
    val i = ctx.freshName("i")
    val end = ctx.freshName("end")
    val acc = ctx.freshName("acc")
    val b = ctx.freshName("b")
    val d = ctx.freshName("d")
    val decode: String =
      s"""
         |int $end = ${pos - 1} + $len;
         |if ($end > $s.numBytes()) $end = $s.numBytes();
         |if (${pos - 1} >= $end) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = ${pos - 1}; $i < $end; $i++) {
         |    byte $b = $s.getByte($i);
         |    int $d;
         |    if ($b >= (byte) '0' && $b <= (byte) '9') $d = $b - '0';
         |    else if ($b >= (byte) 'a' && $b <= (byte) 'z') $d = $b - 'a' + 10;
         |    else if ($b >= (byte) 'A' && $b <= (byte) 'Z') $d = $b - 'A' + 10;
         |    else $d = -1;
         |    if ($d < 0 || $d >= $radix)
         |      throw new IllegalArgumentException(
         |        "graft_radix_slice_long(radix=$radix): invalid digit byte " + $b);
         |    $acc = $acc * $radix + $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    ev.copy(code =
      code"""
            |${childGen.code}
            |boolean ${ev.isNull} = ${childGen.isNull};
            |long ${ev.value} = 0L;
            |if (!${ev.isNull}) {
            |  $decode
            |}
          """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RadixSliceLong =
    copy(child = newChild)
}
