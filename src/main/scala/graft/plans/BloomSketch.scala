package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-width Bloom filter over RENDERED column values, shared by the
  * analyze-side aggregate ([[BloomAgg]]) and the prune-side membership
  * test (`FileStats.mayMatch`). Both sides MUST hash the same bytes:
  * the store renders values exactly as its min/max stats do (Spark
  * `cast(col AS STRING)`, zoned timestamps as epoch micros), and the
  * pruner re-renders predicate literals into that domain before
  * testing. Kirsch–Mitzenmacher double hashing (two xxhash64 seeds,
  * `h1 + i*h2`) gives the k probe positions; `bits` is a power of two
  * so position reduction is a mask, not a modulo.
  *
  * Payload layout (self-describing, version-tagged): one version byte,
  * one numHashes byte, then the bit words as big-endian longs — a
  * reader derives `bits` from the length, so sidecar entries written
  * under a different analyze configuration still evaluate correctly.
  */
object BloomSketch {
  val Version: Byte = 1
  private val Seed1 = 0x9E3779B97F4A7C15L
  private val Seed2 = 0xC2B2AE3D27D4EB4FL

  def emptyWords(bits: Int): Array[Long] = {
    require(bits >= 64 && (bits & (bits - 1)) == 0, s"bits must be a power of two >= 64, got $bits")
    new Array[Long](bits / 64)
  }

  def add(words: Array[Long], s: UTF8String, numHashes: Int): Unit = {
    val mask = words.length * 64 - 1
    val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1)
    val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2)
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue).toInt & mask
      words(pos >> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val out = new Array[Byte](2 + words.length * 8)
    out(0) = Version
    out(1) = numHashes.toByte
    val bb = java.nio.ByteBuffer.wrap(out, 2, words.length * 8)
    words.foreach(bb.putLong)
    out
  }

  /** Conservative: an unknown version or malformed payload answers
    * "might contain" — blooms are advisory exactly like min/max. */
  def mightContain(payload: Array[Byte], rendered: String): Boolean = {
    if (payload.length < 2 + 8 || payload(0) != Version ||
        ((payload.length - 2) & 7) != 0) return true
    val words = (payload.length - 2) / 8
    if ((words & (words - 1)) != 0) return true
    val numHashes = payload(1).toInt
    if (numHashes <= 0) return true
    val mask = words * 64 - 1
    val s = UTF8String.fromString(rendered)
    val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1)
    val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2)
    val bb = java.nio.ByteBuffer.wrap(payload, 2, payload.length - 2)
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue).toInt & mask
      if ((bb.getLong(2 + (pos >> 6) * 8) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** The bit width a payload was built with (for incremental-analyze
    * reuse checks); 0 when the payload would not actually probe — the
    * SAME shape checks [[mightContain]] applies, so an entry this
    * accepts is one the pruner will consult. A length-only check would
    * let incremental analyze keep a corrupt entry forever: right
    * length, wrong version → every probe degrades to "keep" and the
    * file is never re-sketched. */
  def bitsOf(payloadB64: String): Int = {
    val p = try java.util.Base64.getDecoder.decode(payloadB64)
            catch { case _: IllegalArgumentException => return 0 }
    if (p.length < 2 + 8 || p(0) != Version || ((p.length - 2) & 7) != 0) return 0
    val words = (p.length - 2) / 8
    if ((words & (words - 1)) != 0 || p(1).toInt <= 0) 0 else words * 64
  }
}

/** Per-group Bloom-filter aggregate (C27): `analyze(bloomBits = …)`
  * folds every file's rendered column values into one fixed-width
  * sketch in the same single `groupBy(__file)` pass that computes
  * min/max/null-count — no extra scan. A [[TypedImperativeAggregate]]
  * with an `Array[Long]` buffer: updates are two xxhash64 calls plus k
  * bit-sets, merges are word-wise OR — both O(1) per row/partial, so
  * the aggregate scales exactly like the min/max it rides beside. */
case class BloomAgg(
    child: Expression,
    bits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(bits >= 64 && (bits & (bits - 1)) == 0, s"bits must be a power of two >= 64, got $bits")
  require(numHashes > 0 && numHashes <= 16, s"need 0 < numHashes <= 16, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string (the rendered stats domain), got ${other.simpleString(10)}")
  }
  override def prettyName: String = "graft_bloom_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = BloomSketch.emptyWords(bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomSketch.add(buf, v.asInstanceOf[UTF8String], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomSketch.serialize(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(out)
    buf.foreach(bb.putLong)
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}
