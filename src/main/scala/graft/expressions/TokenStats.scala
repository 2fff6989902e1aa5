package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL the per-document token statistics
  * the text-quality / language-id family consumes, in ONE pass over
  * the raw UTF-8 bytes — where the expression forms each materialize
  * the full token ARRAY per statistic (Catalyst does not CSE the
  * `tokens(c)` subtree across `size(filter(...))` /
  * `aggregate(transform(...))` / CASE branches, so `qualityScore` +
  * `langId` on one row tokenized the text up to 6 times).
  *
  * Returns a struct, each field bit-equal to the expression it replaces:
  *   - n_chars        = `length(c)` (UTF8String.numChars)
  *   - n_punct        = `length(c) − length(regexp_replace(c, PUNCT, ''))`
  *                      with PUNCT = `[\.,;:!\?'"()\[\]{}-]` — all 15
  *                      class members are single ASCII bytes, and ASCII
  *                      bytes never occur inside a multi-byte UTF-8
  *                      sequence, so the byte count IS the char count
  *   - n_tokens       = `size(tokens(c))` ([[TokenRunCount]] semantics)
  *   - sum_token_len  = `aggregate(transform(tokens(c), length), 0L, +)`
  *   - sum_subwords   = `aggregate(transform(tokens(c),
  *                        ceil(length/4.0)::long), 0L, +)`
  *   - has_cjk        = `c rlike '[一-鿿]'` — a valid 3-byte
  *                      sequence with lead 0xE5–0xE9, or lead 0xE4 with
  *                      second byte ≥ 0xB8 (U+4E00 = E4 B8 80 is the
  *                      range floor; E9 BF BF = U+9FFF the ceiling)
  *   - stops          = array, one entry per stop list:
  *                      `size(filter(tokens(c), t → t isin list))`
  *
  * Token boundary/content rule: [[TokenRunCount]]'s analysis — a token
  * is a maximal run of ASCII alphanumerics (uppercase lowers into the
  * run), plus the two Unicode exceptions whose lowercase forms re-enter
  * ASCII: U+212A KELVIN SIGN contributes 'k' and continues the run;
  * U+0130 İ contributes 'i' and ENDS the run (its lowercase adds a
  * combining-dot separator). Everything else lowers to a non-[a-z0-9]
  * char, i.e. a separator.
  *
  * Malformed UTF-8: token/stop counts match the decoded-string forms
  * because Java's replace-on-malformed decoder maps every invalid
  * byte/prefix to U+FFFD (never ASCII, i.e. a separator) and resyncs at
  * the next ASCII/lead byte; `has_cjk` applies the decoder's
  * well-formedness rules so it fires only where rlike's decoded string
  * has the char. `n_punct` is the one field whose HOF form mixes the
  * RAW walker (`length(c)`) with a DECODED count
  * (`length(regexp_replace(...))`): on well-formed input the difference
  * is exactly the punct-byte count (fast path); when the scan sees any
  * malformed sequence it replays the identical JDK decode and adds the
  * raw-vs-decoded code-point delta, staying bit-equal even where the
  * HOF form goes negative. `n_chars` uses numChars' own walker.
  * Null → null.
  *
  * Stop lists ship inside the expression (tiny — tens of words); the
  * per-length byte-comparison table is built lazily per executor, and
  * lookups allocate nothing (token bytes are compared in place). */
case class TokenStats(child: Expression, stopLists: Seq[Seq[String]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_token_stats requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("sum_subwords", LongType, nullable = false),
    StructField("has_cjk", BooleanType, nullable = false),
    StructField("stops", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "graft_token_stats"

  // ---- per-executor lookup: stop terms grouped by byte length ----
  // termBytesByLen(L) = the terms of length L as byte arrays;
  // termListsByLen(L)(i) = the stop-list indices term i belongs to.
  // All terms are [a-z0-9] ASCII by construction of the token domain:
  // a non-conforming term can never equal a token, so it is dropped at
  // build time (same result as the isin() it mirrors).
  @transient private lazy val (termBytesByLen, termListsByLen, maxTermLen) = {
    val byTerm = new java.util.LinkedHashMap[String, java.util.ArrayList[Int]]()
    stopLists.zipWithIndex.foreach { case (list, li) =>
      list.foreach { t =>
        if (t.nonEmpty && t.forall(ch => (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9'))) {
          var e = byTerm.get(t)
          if (e == null) { e = new java.util.ArrayList[Int](); byTerm.put(t, e) }
          if (!e.contains(li)) { e.add(li); () }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    val maxL = byTerm.keySet.asScala.foldLeft(0)((m, t) => math.max(m, t.length))
    val bytes = Array.fill(maxL + 1)(Array.empty[Array[Byte]])
    val lists = Array.fill(maxL + 1)(Array.empty[Array[Int]])
    byTerm.asScala.groupBy(_._1.length).foreach { case (len, terms) =>
      bytes(len) = terms.keysIterator.map(_.getBytes("US-ASCII")).toArray
      lists(len) = terms.valuesIterator.map(_.asScala.map(_.intValue).toArray).toArray
    }
    (bytes, lists, maxL)
  }

  // 16-entry ASCII punct class of TextAnalysis.punctRatio
  private def punctTable: Array[Boolean] = TokenStats.Punct

  def compute(s: UTF8String): GenericInternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    val nLists = stopLists.length
    val stops = new Array[Int](nLists)
    var nTokens = 0
    var sumLen = 0L
    var sumSub = 0L
    var nPunct = 0
    var hasCjk = false
    val buf = new Array[Byte](maxTermLen) // token bytes, capped: longer can't match
    var tokLen = 0                        // chars in the current token
    var i = 0

    @inline def endToken(): Unit = if (tokLen > 0) {
      nTokens += 1
      sumLen += tokLen
      sumSub += (tokLen + 3) / 4          // == ceil(len/4.0) for len ≥ 1
      if (tokLen <= maxTermLen) {
        val terms = termBytesByLen(tokLen)
        var t = 0
        while (t < terms.length) {
          val tb = terms(t)
          var j = 0
          while (j < tokLen && tb(j) == buf(j)) j += 1
          if (j == tokLen) {
            val ls = termListsByLen(tokLen)(t)
            var k = 0
            while (k < ls.length) { stops(ls(k)) += 1; k += 1 }
            t = terms.length          // a token matches at most one term
          } else t += 1
        }
      }
      tokLen = 0
    }

    var malformed = false // any byte the JDK decoder would replace?

    @inline def cont(j: Int): Boolean =
      j < n && (bytes(j) & 0xc0) == 0x80

    while (i < n) {
      val b = bytes(i)
      if (b >= 0) { // ASCII
        var c = b
        val alnum =
          if (b >= '0' && b <= '9') true
          else if (b >= 'a' && b <= 'z') true
          else if (b >= 'A' && b <= 'Z') { c = (b + 32).toByte; true }
          else false
        if (alnum) {
          if (tokLen < maxTermLen) buf(tokLen) = c
          tokLen += 1
        } else {
          endToken()
          if (TokenStats.Punct(b)) nPunct += 1
        }
        i += 1
      } else if (b == 0xE2.toByte && i + 2 < n && bytes(i + 1) == 0x84.toByte &&
          bytes(i + 2) == 0xAA.toByte) { // U+212A KELVIN → 'k', run continues
        if (tokLen < maxTermLen) buf(tokLen) = 'k'
        tokLen += 1
        i += 3
      } else if (b == 0xC4.toByte && i + 1 < n && bytes(i + 1) == 0xB0.toByte) {
        // U+0130 İ → 'i' + combining dot: contributes 'i', run ends
        if (tokLen < maxTermLen) buf(tokLen) = 'i'
        tokLen += 1
        endToken()
        i += 2
      } else {
        // generic non-ASCII: always a token separator; validate the
        // sequence with the JDK decoder's well-formedness rules so
        // (a) has_cjk fires only where rlike's decoded string has the
        // char and (b) a single malformed byte routes n_punct onto the
        // decoder-exact slow path below. On a valid sequence step its
        // full length; on a malformed one step 1 byte — the decoder
        // resyncs at the next lead/ASCII byte the same way, and the
        // extra U+FFFDs are separators either way.
        endToken()
        val u = b & 0xff
        val b2 = if (i + 1 < n) bytes(i + 1) & 0xff else -1
        if (u >= 0xc2 && u <= 0xdf) { // 2-byte
          if (cont(i + 1)) i += 2 else { malformed = true; i += 1 }
        } else if (u >= 0xe0 && u <= 0xef) { // 3-byte
          val b2ok = cont(i + 1) &&
            (u != 0xe0 || b2 >= 0xa0) && (u != 0xed || b2 <= 0x9f)
          if (b2ok && cont(i + 2)) {
            if (!hasCjk && u >= 0xe4 && u <= 0xe9 && (u > 0xe4 || b2 >= 0xb8))
              hasCjk = true
            i += 3
          } else { malformed = true; i += 1 }
        } else if (u >= 0xf0 && u <= 0xf4) { // 4-byte
          val b2ok = cont(i + 1) &&
            (u != 0xf0 || b2 >= 0x90) && (u != 0xf4 || b2 <= 0x8f)
          if (b2ok && cont(i + 2) && cont(i + 3)) i += 4
          else { malformed = true; i += 1 }
        } else { // invalid lead (0x80-0xc1, 0xf5-0xff)
          malformed = true
          i += 1
        }
      }
    }
    endToken()

    // n_punct mirrors length(c) - length(regexp_replace(c, PUNCT, '')):
    // on well-formed input that difference IS the punct-byte count; on
    // malformed input regexp_replace decodes with U+FFFD replacement
    // (UTF8String.toString) whose code-point count differs from the raw
    // numChars walker, so replay the identical decode and add the delta
    // (ASCII punct bytes survive the decoder 1-for-1, so the punct term
    // itself is unchanged).
    val nChars = s.numChars()
    if (malformed) {
      val dec = s.toString
      nPunct += nChars - dec.codePointCount(0, dec.length)
    }

    val row = new GenericInternalRow(7)
    row.setInt(0, nChars)
    row.setInt(1, nPunct)
    row.setInt(2, nTokens)
    row.setLong(3, sumLen)
    row.setLong(4, sumSub)
    row.setBoolean(5, hasCjk)
    val arr = new Array[Any](nLists)
    var z = 0
    while (z < nLists) { arr(z) = stops(z); z += 1 }
    row.update(6, new GenericArrayData(arr))
    row
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStats", this, classOf[TokenStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  /** `[\.,;:!\?'"()\[\]{}-]` as a byte table. */
  private[expressions] val Punct: Array[Boolean] = {
    val t = new Array[Boolean](128)
    ".,;:!?'\"()[]{}-".foreach(ch => t(ch.toInt) = true)
    t
  }
}

/** The curation-pipeline triple (lang, quality, n_tokens) computed
  * INSIDE the kernel from one [[TokenStats]] scan — every field is the
  * same IEEE double / CASE arithmetic the `TextAnalysis.*FromStats`
  * Catalyst forms evaluate (multiply-adds in the identical order, no
  * fused operations on either side), so the values are bit-equal
  * (parity spec'd).
  *
  * Why this exists when the `FromStats` composition is already one
  * scan: in the STREAMING curate stage Catalyst pushes the
  * quality/lang predicates down through the projection, substituting
  * the full score expressions — ~30 `getField(TokenStats(...))`
  * references — into one whole-stage-codegen consume function, which
  * crossed the JVM's 64 KB method limit and dropped the entire stage
  * to interpreted mode (observed r18; batch curate is shielded by its
  * localCheckpoint barrier). With the scores computed in-kernel a
  * pushed-down predicate carries ~4 small subtrees instead.
  *
  * `stopLists` must be the four curation language lists in
  * en/de/es/fr precedence order (en doubles as the quality evidence
  * list, index 0). */
case class TokenCurateStats(child: Expression, stopLists: Seq[Seq[String]])
  extends UnaryExpression {
  require(stopLists.length == 4,
    s"TokenCurateStats needs the 4 en/de/es/fr stop lists, got ${stopLists.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_token_curate_stats requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))

  override def prettyName: String = "graft_token_curate_stats"

  @transient private lazy val inner = TokenStats(child, stopLists)

  def compute(s: UTF8String): GenericInternalRow = {
    val st = inner.compute(s)
    val nChars = st.getInt(0)
    val nPunct = st.getInt(1)
    val nTokens = st.getInt(2)
    val sumLen = st.getLong(3)
    val hasCjk = st.getBoolean(5)
    val stops = st.getArray(6)
    val en = stops.getInt(0); val de = stops.getInt(1)
    val es = stops.getInt(2); val fr = stops.getInt(3)

    // qualityFromStats, operation for operation
    val ntD = nTokens.toDouble
    val lenOk = if (ntD >= 10.0 && ntD <= 10000.0) 1.0 else 0.0
    val mtl = if (nTokens == 0) 0.0 else sumLen.toDouble / nTokens
    val shapeOk = if (mtl >= 2.0 && mtl <= 12.0) 1.0 else 0.0
    val pRatio = if (nChars == 0) 0.0 else nPunct.toDouble / nChars
    val punctOk = if (pRatio <= 0.2) 1.0 else 0.0
    val sRatio = if (nTokens == 0) 0.0 else en.toDouble / nTokens
    val stopOk = if (sRatio >= 0.01) 1.0 else 0.0
    val quality = lenOk * 0.3 + shapeOk * 0.3 + punctOk * 0.2 + stopOk * 0.2

    // langIdFromStats' CASE ladder
    val lang =
      if (hasCjk) "zh"
      else if (en == 0 && de == 0 && es == 0 && fr == 0) "und"
      else if (en >= de && en >= es && en >= fr) "en"
      else if (de >= es && de >= fr) "de"
      else if (es >= fr) "es"
      else "fr"

    val row = new GenericInternalRow(3)
    row.update(0, UTF8String.fromString(lang))
    row.setDouble(1, quality)
    row.setInt(2, nTokens)
    row
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenCurateStats", this,
      classOf[TokenCurateStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCurateStats =
    copy(child = newChild)
}
