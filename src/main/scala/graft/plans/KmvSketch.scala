package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** C41d: the PORTABLE K-minimum-values distinct-count sketch as a
  * native aggregate family — the maintained-summary counterpart of
  * A45b's `events_distinct_kmv` (Analytics.distinctKmvPortable), which
  * derives the same registers through a distinct + window query. The
  * reference surface this extends is the C41 materialized-summary
  * story: COUNT/SUM/MIN/MAX summaries exist (C41/C41b/C41c), and the
  * next aggregate a real MV user asks for is a distinct count.
  *
  * Sketch = the k smallest DISTINCT 32-bit hashes of the value's
  * string rendering, hash = the first 8 hex digits of md5 — the
  * engine's established cross-engine-verifiable idiom (A14b/L3b/A45b):
  * both the registers and the estimator
  * `(k−1)·2^32 div h_k` (exact count below k) re-derive verbatim in
  * ANSI SQL, so a maintained sketch is ORACLE-EXACT, unlike
  * DataSketches HLL (A45) whose registers only a JVM can rebuild.
  *
  * Why KMV and not HLL for MAINTAINED summaries: KMV union is exact
  * set algebra — the union's k smallest distinct hashes of row subsets
  * ARE the whole's k smallest — so merge-on-insert composes
  * bit-identically with a full recompute, which is what lets
  * [[SummaryRewrite]] serve [[KmvDistinct]] aggregates from the stored
  * sketch without changing a single output bit. One aggregation pass,
  * capacity-bounded buffers (k longs), map-side combinable — at 100 TB
  * this is a bounded-register aggregation, never a distinct shuffle.
  *
  * Three faces over one core:
  *  - [[KmvSketchAgg]]  — aggregate raw values → sorted ascending
  *    `array<bigint>` registers (bootstrap + rescan paths).
  *  - [[KmvDistinct]]   — aggregate raw values → the LONG estimate
  *    (the user-facing query shape the rewrite recognizes).
  *  - [[KmvMergeAgg]]   — aggregate stored register arrays → merged
  *    registers (the rewrite's subset-grouping rollup).
  * Plus the scalar [[KmvEstimate]] (registers → estimate) serving the
  * exact-grouping rewrite and direct summary reads.
  */
object KmvCore {

  // per-row hot path of every sketch update/bootstrap/rescan: reuse one
  // digest per thread instead of a per-value provider lookup+allocation
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 hex digits of md5(bytes) as an unsigned 32-bit value,
    * CLAMPED to ≥ 1 — equals `greatest(conv(substring(md5(s),1,8),16,
    * 10), 1)` and the GREATEST-wrapped DuckDB strpos-decode idiom,
    * byte for byte. The clamp exists because the estimator divides by
    * the kth register: an md5 whose first four bytes are zero
    * (p = 2⁻³² per distinct value) would otherwise be BY CONSTRUCTION
    * the kth-smallest and turn every estimate over its group into a
    * division by zero. Mapping 0→1 merges that value with the hash-1
    * preimages — a one-in-4-billion extra collision, the sketch's
    * native error class — and every SQL twin applies the same clamp,
    * so engine and oracle stay bit-identical. */
  def hash32(s: UTF8String): Long = {
    val m = md5.get()
    m.reset()
    val d = m.digest(s.getBytes)
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    if (h == 0L) 1L else h
  }

  /** Keep the k smallest distinct values. TreeSet: last() is the
    * current kth-smallest, the only candidate for eviction. */
  def add(buf: java.util.TreeSet[java.lang.Long], h: Long, k: Int): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last() && !buf.contains(h)) {
      buf.add(h); buf.remove(buf.last()); ()
    }
  }

  /** (k−1)·2^32 div h_k, exact integer arithmetic; a sketch holding
    * fewer than k hashes IS the exact distinct count. The divisor is
    * clamped ≥ 1 as a second line of defense behind [[hash32]]'s 0→1
    * mapping (a register array handed in from outside the sketch
    * builders could still carry a 0). */
  def estimate(nHashes: Int, kthHash: Long, k: Int): Long =
    if (nHashes < k) nHashes.toLong
    else (k - 1).toLong * 4294967296L / math.max(kthHash, 1L)

  def estimateOf(sorted: Array[Long], k: Int): Long =
    if (sorted.length < k) sorted.length.toLong
    else estimate(sorted.length, sorted(k - 1), k)

  /** Static forwarder for [[KmvEstimate]]'s generated code. */
  def estimateOfArrayData(a: org.apache.spark.sql.catalyst.util.ArrayData, k: Int): Long =
    estimateOf(a.toLongArray(), k)

  def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach(h => out.writeLong(h))
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }
}

/** Shared TypedImperativeAggregate plumbing of the three KMV faces. */
abstract class KmvAggBase extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {
  // NB: no require() here — this constructor re-runs during Java
  // deserialization on executors BEFORE the leaf's fields restore
  // (k would read 0 and fail the task); leaves validate instead.
  def k: Int

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    other.forEach(h => KmvCore.add(buf, h, k))
    buf
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvCore.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvCore.deserialize(bytes)

  protected def sortedArray(buf: java.util.TreeSet[java.lang.Long]): Array[Long] = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** Raw values → sorted ascending register array (the sketch). NULL is
  * no observation (the sketchUnits discipline). */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string (cast the value), got ${other.simpleString(10)}")
  }
  require(k > 0, "need k > 0")
  override def prettyName: String = "graft_kmv_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) KmvCore.add(buf, KmvCore.hash32(v.asInstanceOf[UTF8String]), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sortedArray(buf))

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** Raw values → the LONG distinct-count estimate — the aggregate a
  * user writes (`GraftFunctions.kmvDistinct`); [[SummaryRewrite]]
  * recognizes exactly this node and serves it from a registered
  * [[graft.store.IncrementalAgg.summarizeDistinct]] summary,
  * bit-identically (KMV union is exact set algebra). */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string (cast the value), got ${other.simpleString(10)}")
  }
  require(k > 0, "need k > 0")
  override def prettyName: String = "graft_kmv_distinct"
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) KmvCore.add(buf, KmvCore.hash32(v.asInstanceOf[UTF8String]), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvCore.estimateOf(sortedArray(buf), k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

/** Stored register arrays → merged registers — the rewrite's
  * subset-grouping rollup (merge per summary row, k longs each). */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> registers, got ${other.simpleString(10)}")
  }
  require(k > 0, "need k > 0")
  override def prettyName: String = "graft_kmv_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      var i = 0
      while (i < a.length) { KmvCore.add(buf, a(i), k); i += 1 }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sortedArray(buf))

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}

object KmvStr {
  /** Parse a stored CSV register string (ascending; "" = empty). */
  def parse(s: UTF8String): Array[Long] = {
    val str = s.toString
    if (str.isEmpty) Array.emptyLongArray
    else str.split(',').map(java.lang.Long.parseLong)
  }

  /** Estimate straight off the stored CSV: the registers persist
    * sorted ascending with at most k entries, so the kth smallest is
    * the LAST token. Static forwarder for generated code. */
  def estimate(s: UTF8String, k: Int): Long = {
    val a = parse(s)
    KmvCore.estimateOf(a, k)
  }

  def render(sorted: Array[Long]): UTF8String =
    UTF8String.fromString(sorted.mkString(","))
}

/** Stored CSV register strings → merged CSV registers — the rewrite's
  * subset-grouping rollup over a [[graft.store.IncrementalAgg
  * .summarizeDistinct]] summary (k longs per summary row). */
case class KmvMergeStrAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a CSV register string, got ${other.simpleString(10)}")
  }
  require(k > 0, "need k > 0")
  override def prettyName: String = "graft_kmv_merge_str"
  override def nullable: Boolean = false
  override def dataType: DataType = StringType

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = KmvStr.parse(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < a.length) { KmvCore.add(buf, a(i), k); i += 1 }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvStr.render(sortedArray(buf))

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeStrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeStrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeStrAgg =
    copy(child = newChild)
}

/** Scalar CSV registers → estimate: how [[SummaryRewrite]] serves a
  * [[KmvDistinct]] aggregate from the stored sketch column. */
case class KmvEstimateStr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "need k > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a CSV register string, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_kmv_estimate_str"

  override def nullSafeEval(input: Any): Any =
    KmvStr.estimate(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KmvStr.estimate($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): KmvEstimateStr =
    copy(child = newChild)
}

/** Scalar registers → estimate: serves exact-grouping rewrites and
  * direct summary reads. Whole-stage-codegen'd via a static forwarder
  * (the DtoInstant pattern — no CodegenFallback on a serving path). */
case class KmvEstimate(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "need k > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> registers, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_kmv_estimate"

  override def nullSafeEval(input: Any): Any =
    KmvCore.estimateOfArrayData(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KmvCore.estimateOfArrayData($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}
