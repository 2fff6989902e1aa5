package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregation state: a k-capacity binary heap over two
  * PRIMITIVE arrays (sims, ids), rooted at the WORST kept element
  * under the ordering (sim DESC, id ASC) — so a full heap admits a
  * candidate with one root comparison and evicts by sift-down, and an
  * update never allocates. This is what replaces the
  * collect_list-everything-then-slice carrier in the top-k family:
  * that form buffered EVERY scored candidate per (group, partition)
  * as a boxed struct before sorting (10M struct allocations for a
  * 20k-query IVF self-retrieval — the r14 q195 receipt), where this
  * state holds exactly k primitives per group at all times. */
final class TopKHeapState(val k: Int) {
  val sims = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // a is WORSE than b under (sim DESC, id ASC) — the heap invariant
  // keeps the worst kept element at the root
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def insert(s: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      sims(i) = s; ids(i) = id; size += 1
      // sift up: parent must be worse-or-equal than children
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(sims(i), ids(i), sims(p), ids(p))) {
          val ts = sims(i); val ti = ids(i)
          sims(i) = sims(p); ids(i) = ids(p)
          sims(p) = ts; ids(p) = ti
          i = p
        } else return
      }
    } else if (k > 0 && worse(sims(0), ids(0), s, id)) {
      sims(0) = s; ids(0) = id
      // sift down
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i // the worst of (i, l, r) must live at i
        if (l < size && worse(sims(l), ids(l), sims(w), ids(w))) w = l
        if (r < size && worse(sims(r), ids(r), sims(w), ids(w))) w = r
        if (w == i) return
        val ts = sims(i); val ti = ids(i)
        sims(i) = sims(w); ids(i) = ids(w)
        sims(w) = ts; ids(w) = ti
        i = w
      }
    }
  }
}

/** Exact top-`k` (sim DESC, ties → id ASC) as a single mergeable
  * aggregate returning array<struct<sim, id>> in rank order — the
  * bounded-memory carrier of the ANN top-k family
  * ([[graft.ops.Similarity]]): per-partition partials hold k
  * primitives per group, the exchange moves one k-slice row per
  * (group, partition), and the output array's POSITION is the rank
  * (no rank window anywhere). Null sims/ids are skipped (callers
  * filter null vectors before scoring); NaN sims are skipped too —
  * a NaN similarity is never a meaningful neighbor, and the two
  * legacy carriers already disagreed about NaN placement. */
case class BoundedTopK(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeapState] with BinaryLike[Expression] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def prettyName: String = "bounded_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKHeapState = new TopKHeapState(k)

  override def update(buf: TopKHeapState, input: InternalRow): TopKHeapState = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null) {
      val sv = s.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(sv))
        buf.insert(sv, i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKHeapState, other: TopKHeapState): TopKHeapState = {
    var i = 0
    while (i < other.size) { buf.insert(other.sims(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKHeapState): Any = {
    val idx = Array.range(0, buf.size).sortWith { (a, b) =>
      buf.sims(a) > buf.sims(b) ||
        (buf.sims(a) == buf.sims(b) && buf.ids(a) < buf.ids(b))
    }
    new GenericArrayData(idx.map { i =>
      val r = new GenericInternalRow(2)
      r.setDouble(0, buf.sims(i)); r.setLong(1, buf.ids(i))
      r
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKHeapState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.sims(i)); i += 1 }
    i = 0
    while (i < buf.size) { bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeapState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val kk = bb.getInt; val n = bb.getInt
    val st = new TopKHeapState(kk)
    st.size = n
    var i = 0
    while (i < n) { st.sims(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < n) { st.ids(i) = bb.getLong; i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)
}
