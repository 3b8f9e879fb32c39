package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftx.bridge

/** Column-level entry points for graft's native Catalyst expressions. */
object GraftFunctions {

  /** All k MinHash values of a pre-hashed (mod 2^31−1) shingle array. */
  def minhashSignature(hashes: Column, k: Int): Column =
    bridge.column(MinHashSignature(bridge.expression(hashes), k))

  /** Polynomial rolling-hash fingerprint of a string column. */
  def rollingHash(text: Column): Column =
    bridge.column(RollingHash(bridge.expression(text)))

  /** Unicode NFC canonical normalization of a string column. */
  def nfcNormalize(text: Column): Column =
    bridge.column(NfcNormalize(bridge.expression(text)))

  /** Top-k frequent terms per group via the capacity-bounded
    * space-saving sketch (exact when distinct ≤ capacity). */
  def topKByFreq(term: Column, k: Int, capacity: Int = 4096): Column =
    bridge.column(SpaceSaving(bridge.expression(term), k, capacity).toAggregateExpression())

  /** Per-group Bloom sketch over rendered (string) values — the C27
    * analyze-side aggregate; see [[BloomSketch]] for the payload. */
  def bloomSketch(rendered: Column, bits: Int, numHashes: Int): Column =
    bridge.column(BloomAgg(bridge.expression(rendered), bits, numHashes).toAggregateExpression())

  /** One-pass codegen'd cosine similarity (see [[CosineSimilarity]]);
    * bit-identical to the composed higher-order form. */
  def cosine(a: Column, b: Column): Column =
    bridge.column(CosineSimilarity(bridge.expression(a), bridge.expression(b)))

  /** Codegen'd dot product (see [[DotProduct]]); bit-identical to the
    * composed `aggregate(zip_with(...))` fold. */
  def dot(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  /** Codegen'd EXACT integer dot product (see [[LongDot]]); equals the
    * composed `aggregate(zip_with(...))` fold on every input (integer
    * addition is order-independent). */
  def dotLong(a: Column, b: Column): Column =
    bridge.column(LongDot(bridge.expression(a), bridge.expression(b)))

  /** Native BPE document encode (see [[BpeEncode]]); bit-identical to
    * the composed nested-HOF encode and the classic in-memory twin. */
  def bpeEncode(text: Column, merges: Seq[(String, String)], vocab: Seq[String]): Column =
    bridge.column(BpeEncode(bridge.expression(text), merges, vocab))

  /** Codegen'd fixed-point scaling (see [[FloorScale]]); bit-identical
    * to the composed `transform(v, x => floor(x*scale).cast("long"))`. */
  def floorScale(v: Column, scale: Long): Column =
    bridge.column(FloorScale(bridge.expression(v), scale))

  /** Portable KMV distinct-count estimate of a value column (see
    * [[KmvDistinct]]) — the aggregate shape [[SummaryRewrite]] serves
    * from a maintained C41d sketch summary, bit-identically. The value
    * is hashed through its STRING rendering (the md5 idiom). */
  def kmvDistinct(value: Column, k: Int = 64): Column =
    bridge.column(KmvDistinct(
      bridge.expression(value.cast("string")), k).toAggregateExpression())

  /** The KMV registers themselves (sorted ascending `array<bigint>`,
    * at most k) — the bootstrap/rescan aggregate of
    * [[graft.store.IncrementalAgg.summarizeDistinct]]. */
  def kmvSketch(value: Column, k: Int = 64): Column =
    bridge.column(KmvSketchAgg(
      bridge.expression(value.cast("string")), k).toAggregateExpression())

  /** Merge stored KMV register arrays (exact set algebra — the union's
    * k smallest distinct hashes). */
  def kmvMerge(registers: Column, k: Int = 64): Column =
    bridge.column(KmvMergeAgg(bridge.expression(registers), k).toAggregateExpression())

  /** Scalar estimate from stored KMV registers. */
  def kmvEstimate(registers: Column, k: Int = 64): Column =
    bridge.column(KmvEstimate(bridge.expression(registers), k))

  /** Codegen'd IVF coarse assignment (see [[NearestCentroid]]);
    * bit-identical to array_position(array_min) over the composed
    * distance transform, first-min tie-break included. */
  def nearestCentroid(v: Column, cents: Seq[Seq[Double]]): Column =
    bridge.column(NearestCentroid(bridge.expression(v), cents))
}
