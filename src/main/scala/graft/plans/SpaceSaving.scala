package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native heavy-hitters AGGREGATE (SURVEY §7.1 ladder, the third rung
  * next to the scalar Expressions and the PairsWithinGroups SparkPlan):
  * the space-saving sketch (Metwally et al.) as a
  * [[TypedImperativeAggregate]] — top-k frequent items per group in one
  * pass with a CAPACITY-BOUNDED buffer, the boilerplate/top-domain
  * detector a corpus pipeline runs where an exact per-term aggregation
  * would shuffle the whole vocabulary.
  *
  * Buffer = at most `capacity` (term → (count, maxErr)) entries.
  * Insertion past capacity evicts the current minimum m and charges the
  * newcomer count m+1 with error m (the classic guarantee: true count
  * ∈ [count − maxErr, count]; any item with true frequency > N/capacity
  * is present). EXACT when a group's distinct terms ≤ capacity — counts
  * are then plain counts with zero error, which is what the DuckDB
  * oracle pins; partial-buffer merges trim lowest-count entries past
  * capacity (exactness unaffected in the exact regime, error keeps its
  * per-entry bound otherwise).
  *
  * Output: array<struct<term, cnt, max_err>> sorted by (cnt desc, term
  * binary asc — UTF-8 byte order == codepoint order, engine-portable),
  * truncated to k.
  */
/** The algorithm itself, shared verbatim by the batch aggregate and the
  * streaming twin ([[graft.streaming.Streams.streamingHeavyHitters]]) so
  * their sketches are behaviorally identical. Keys are generic; the
  * tie-break ordering must be the engine-portable one (binary for
  * UTF8String; String's UTF-16 order agrees on BMP text). */
object SpaceSavingCore {

  def add[K](buf: mutable.HashMap[K, (Long, Long)], key: K, capacity: Int,
      copyKey: K => K)(implicit ord: Ordering[K]): Unit =
    buf.get(key) match {
      case Some((c, e)) => buf.update(key, (c + 1, e))
      case None =>
        if (buf.size < capacity) buf.update(copyKey(key), (1L, 0L))
        else {
          val (_, minC) = evictMin(buf)
          buf.update(copyKey(key), (minC + 1, minC))
        }
    }

  def mergeInto[K](buf: mutable.HashMap[K, (Long, Long)],
      other: scala.collection.Map[K, (Long, Long)], capacity: Int)(implicit ord: Ordering[K]): Unit = {
    other.foreach { case (t, (c, e)) =>
      buf.get(t) match {
        case Some((c0, e0)) => buf.update(t, (c0 + c, e0 + e))
        case None => buf.update(t, (c, e))
      }
    }
    while (buf.size > capacity) evictMin(buf)
  }

  def top[K](buf: scala.collection.Map[K, (Long, Long)], k: Int)(implicit ord: Ordering[K]): Seq[(K, Long, Long)] =
    buf.toSeq
      .sortWith { case ((t1, (c1, _)), (t2, (c2, _))) =>
        c1 > c2 || (c1 == c2 && ord.lt(t1, t2))
      }
      .take(k)
      .map { case (t, (c, e)) => (t, c, e) }

  private def evictMin[K](buf: mutable.HashMap[K, (Long, Long)])(implicit ord: Ordering[K]): (K, Long) = {
    var minK: Option[K] = None
    var minC = Long.MaxValue
    buf.foreach { case (t, (c, _)) =>
      if (c < minC || (c == minC && minK.forall(mk => ord.lt(t, mk)))) {
        minC = c; minK = Some(t)
      }
    }
    buf.remove(minK.get)
    (minK.get, minC)
  }
}

case class SpaceSaving(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, (Long, Long)]]
  with UnaryLike[Expression] {

  require(k > 0 && capacity >= k, "need capacity >= k > 0")

  private implicit def utf8Ordering: Ordering[UTF8String] = Ordering.ordered[UTF8String]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString(10)}")
  }
  override def prettyName: String = "graft_space_saving_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, (Long, Long)] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, (Long, Long)],
      input: InternalRow): mutable.HashMap[UTF8String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null)
      SpaceSavingCore.add[UTF8String](buf, v.asInstanceOf[UTF8String], capacity, _.clone())
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, (Long, Long)],
      other: mutable.HashMap[UTF8String, (Long, Long)]): mutable.HashMap[UTF8String, (Long, Long)] = {
    SpaceSavingCore.mergeInto(buf, other, capacity)
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, (Long, Long)]): Any =
    new GenericArrayData(SpaceSavingCore.top(buf, k)
      .map { case (t, c, e) => InternalRow(t, c, e) }.toArray[Any])

  override def serialize(buf: mutable.HashMap[UTF8String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, (c, e)) =>
      val b = t.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, (Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSaving =
    copy(child = newChild)
}
