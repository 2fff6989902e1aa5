package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the md5 hex digests of every stride-1
  * CHARACTER window of fixed `width` over a string, in one pass —
  * `array(md5(substring(s, 1, w)), md5(substring(s, 2, w)), …)`, i.e.
  * exactly what the exact-substring dedup family (Lee et al. 2022)
  * builds with `explode(sequence(…))` + `substring` + `md5`.
  *
  * Why: the expression-chain form materializes a fresh `width`-char
  * string PER WINDOW per row — measured at sf0.1 (1.3M windows) the
  * substring materialization alone costs 3× the md5s it feeds. Here
  * the UTF-8 bytes are walked ONCE per document (one char→byte offset
  * table), and each window hashes its byte range in place via one
  * shared per-thread MessageDigest — no per-window string, no
  * per-window allocation beyond the 32-char digest hex itself.
  *
  * Output parity is BIT-EXACT with the chain it replaces: windows are
  * character windows (substring semantics), hashed over their UTF-8
  * bytes (`CAST(… AS BINARY)` semantics), rendered as lowercase hex
  * (md5 semantics) — so the oracle-replayable md5 fingerprints the
  * family prices stay exactly as they were, and the q197/q198/q210
  * rows verify unchanged. Null text → null; fewer than `width` chars
  * → empty array. The element at index i is the window at offset i —
  * `posexplode` of this array IS the old (off, fp) pair stream. */
case class Md5Windows(child: Expression, width: Int) extends UnaryExpression {
  require(width >= 1, s"width must be >= 1, got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_windows requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_md5_windows"

  override protected def nullSafeEval(input: Any): Any =
    Md5Windows.compute(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Md5Windows.compute($c, $width);")

  override protected def withNewChildInternal(newChild: Expression): Md5Windows =
    copy(child = newChild)
}

object Md5Windows {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".getBytes("US-ASCII")

  /** Bytes consumed by the UTF-8 char starting with byte `b` — the
    * exact UTF8String.numBytesForFirstByte table (Spark 4.1.2): every
    * invalid leading byte advances 1, which includes dangling
    * continuations (0x80–0xBF) AND the never-valid leaders 0xC0/0xC1
    * and 0xF5–0xFF. Matching the table exactly keeps window offsets
    * aligned with substring's walker even on malformed UTF-8, so the
    * (off, fp) stream and the cutSpans/maxDupSpans slices that consume
    * it stay bit-identical to the explode+substring+md5 chain. */
  @inline private def charLen(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0x80) 1
    else if (u < 0xc2) 1 // continuation byte or invalid 0xC0/0xC1 leader
    else if (u < 0xe0) 2
    else if (u < 0xf0) 3
    else if (u < 0xf5) 4
    else 1 // invalid 0xF5–0xFF leader: advance 1
  }

  /** One pass: char→byte offsets, then one md5 per window byte-range.
    * Shared by the interpreted and codegen paths. */
  def compute(s: UTF8String, width: Int): ArrayData = {
    val bytes = s.getBytes // one copy per document, not per window
    val n = bytes.length
    // char-boundary byte offsets (numChars + 1 entries, last = n)
    var chars = 0
    var i = 0
    while (i < n) { i += charLen(bytes(i)); chars += 1 }
    val nWins = chars - width + 1
    if (nWins <= 0) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < n) { offs(c) = i; i += charLen(bytes(i)); c += 1 }
    offs(chars) = n
    val md = digests.get()
    val out = new Array[Any](nWins)
    var w = 0
    while (w < nWins) {
      md.reset()
      md.update(bytes, offs(w), offs(w + width) - offs(w))
      val dg = md.digest()
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HexChars((dg(j) >> 4) & 0xf)
        hex(2 * j + 1) = HexChars(dg(j) & 0xf)
        j += 1
      }
      out(w) = UTF8String.fromBytes(hex)
      w += 1
    }
    new GenericArrayData(out)
  }
}
