package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV ("k minimum values") theta-sketch aggregate — the bounded-state
  * distinct-counting sketch whose VALUE SET (unlike HLL's register array,
  * q52) supports set algebra: union by merging value sets, and — the
  * capability HLL fundamentally lacks — INTERSECTION estimation, by
  * counting common values below the combined theta
  * (Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", SIGMOD 2007).
  *
  * A custom Catalyst `TypedImperativeAggregate` (tier (b): an aggregate
  * function, not a plan node): state is the k smallest DISTINCT hash
  * values seen, kept in a bounded TreeSet — O(k) memory however many
  * rows flow through — updated map-side (partial aggregation), merged
  * associatively, serialized as 8·|state| bytes between stages. Exactly
  * the shape Spark's own datasketches aggregates use, hand-built.
  *
  * Determinism: the input is an already-hashed LONG column (the portable
  * polynomial hash both engines share — TextFunctions.polyHash / the
  * dPoly oracle snippet), so the sketch CONTENT is deterministic and the
  * DuckDB oracle reproduces it exactly: k smallest distinct hashes =
  * `list(h ORDER BY h) ... LIMIT k`. Estimates are then plain IEEE
  * arithmetic over identical integers — hash-gated, not
  * tolerance-gated.
  *
  * Estimator (downstream column arithmetic, see PipelineQueries q56):
  * n < k ⇒ exact n; else (k−1)/θ with θ = kth-smallest / HashMod;
  * intersection counts common values < min(θ_a, θ_b) and divides by it.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0 && k <= (1 << 20), s"kmv sketch size must be in (0, 2^20], got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(s: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (s.size < k || h < s.last) {
      if (s.add(h) && s.size > k) { s.pollLast(); () }
    }

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val s = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) s.add(bb.getLong())
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Aggregate a pre-hashed LONG column into its KMV sketch
    * (sorted array<long> of the k smallest distinct hashes). */
  def kmvSketch(c: Column, k: Int): Column =
    column(KmvSketchAgg(expression(c), k).toAggregateExpression())
}
