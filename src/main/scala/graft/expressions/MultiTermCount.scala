package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975, CACM) —
  * matches ALL of `terms` against a document in ONE pass over its
  * UTF-16 code units, counting every (including overlapping)
  * occurrence of every term. This is the scale answer to blocklist /
  * taxonomy filtering: N `contains()` predicates cost O(N·L) per
  * document and N codegen branches, the automaton costs O(L + hits)
  * regardless of how many thousand terms the blocklist carries.
  *
  * Built once on the driver from the term list, serialized to
  * executors inside the expression (goto as per-state char→state
  * maps, failure links BFS-computed, outputs PRE-MERGED through the
  * failure chain so the scan itself never walks fail links for
  * output — the standard construction). */
final class AcAutomaton(terms: Array[String]) extends Serializable {

  // gotoM/fail/outArr are the ONLY serialized state — the build-time
  // per-state output buffers are constructor-local scratch, so a
  // 10k-term automaton ships to executors as the compact arrays alone
  private val (gotoM, fail, outArr) = {
    import scala.collection.mutable.ArrayBuffer
    val g = ArrayBuffer(new java.util.HashMap[Character, Integer]())
    val outB = ArrayBuffer(ArrayBuffer.empty[Int])
    // trie phase
    terms.zipWithIndex.foreach { case (t, ti) =>
      require(t.nonEmpty, "blocklist terms must be non-empty")
      var st = 0
      t.foreach { ch =>
        val nx = g(st).get(ch)
        st = if (nx != null) nx.intValue
        else {
          g += new java.util.HashMap[Character, Integer]()
          outB += ArrayBuffer.empty[Int]
          g(st).put(ch, g.size - 1)
          g.size - 1
        }
      }
      outB(st) += ti
    }
    val f = new Array[Int](g.size)
    // BFS failure links; outputs merged down the fail chain as we go
    val q = new java.util.ArrayDeque[Int]()
    g(0).forEach { (_, s) => f(s) = 0; q.add(s); () }
    while (!q.isEmpty) {
      val u = q.poll()
      outB(u) ++= outB(f(u))
      g(u).forEach { (ch, v) =>
        var fu = f(u)
        while (fu != 0 && !g(fu).containsKey(ch)) fu = f(fu)
        val nf = g(fu).get(ch)
        f(v) = if (nf != null && nf != v) nf.intValue else 0
        q.add(v)
        ()
      }
    }
    (g.toArray, f, outB.map(_.toArray).toArray)
  }
  val nTerms: Int = terms.length

  /** Per-term occurrence counts (all matches, overlaps included). */
  def countAll(s: UTF8String): GenericArrayData = {
    val counts = new Array[Int](nTerms)
    val j = s.toString
    var st = 0
    var i = 0
    while (i < j.length) {
      val ch = j.charAt(i)
      var g = gotoM(st).get(ch)
      while (g == null && st != 0) { st = fail(st); g = gotoM(st).get(ch) }
      st = if (g != null) g.intValue else 0
      val o = outArr(st)
      var k = 0
      while (k < o.length) { counts(o(k)) += 1; k += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** Native Catalyst expression wrapping [[AcAutomaton]]: per-term match
  * counts of a fixed term list, one automaton pass per row inside
  * WholeStageCodegen (the automaton rides the expression as a codegen
  * reference object). Returns array<int> aligned with `terms`;
  * null in → null out. */
case class MultiTermCount(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if terms.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      "graft_multi_term_count requires at least one term")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_multi_term_count requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_multi_term_count"

  @transient private lazy val automaton = new AcAutomaton(terms.toArray)

  override protected def nullSafeEval(input: Any): Any =
    automaton.countAll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countAll($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiTermCount =
    copy(child = newChild)
}
