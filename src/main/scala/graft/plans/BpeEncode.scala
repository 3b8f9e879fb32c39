package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE document encoder: `text` → `array<int>` of token ids
  * under a trained merge table + vocabulary — the whole encode (word
  * split, per-word merge replay in rank order, symbol→id lookup) as
  * ONE JVM loop per row.
  *
  * Replaces the composed
  * `flatten(transform(tokens, w => transform(foldLeft(bpeMergeStep…), id lookup)))`
  * — 8 chained `ArrayAggregate` rewrites nested inside two
  * `ArrayTransform`s, every one CodegenFallback: the composed form
  * interprets ~10 lambda-driven ArrayData traversals per WORD, which
  * made the tokenize capstone the heaviest bench query by far. Here a
  * word is a small String array folded in place; the only per-row
  * allocation is the output ids array.
  *
  * Bit-compatibility contract (CurationSpec pins native ≡ composed ≡
  * the classic in-memory twin): word split is `text.split(" ", -1)` —
  * exactly Spark's `split(text, " ")` (regex split, limit −1, trailing
  * empties kept); the merge replay is the single-pass left-to-right
  * fold of `bpeMergeStep` (a merged token never re-participates as the
  * left side within the same rank); ids assign by LAST-wins vocabulary
  * lookup (`vocab.zipWithIndex.toMap` semantics when two merge
  * products collide); unknown symbols → −1. Null text → null.
  *
  * The merge table and vocabulary live in reference arrays (driver-side
  * model state, tokenizer-sized), not the expression tree — plan
  * analysis stays O(1) in |vocab|.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)], vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val ma: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mb: Array[String] = merges.map(_._2).toArray
  @transient private lazy val mab: Array[String] = merges.map(m => m._1 + m._2).toArray
  @transient private lazy val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    var i = 0
    while (i < vocab.size) { m.put(vocab(i), i) ; i += 1 } // later duplicate wins
    m
  }

  /** The per-row encode — public so generated code can call it through
    * a reference object (keeps the expression inside whole-stage
    * codegen: one virtual call per row, no interpreted tree walk). */
  def encode(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[Integer](words.length * 4)
    val nm = ma.length
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      // single-symbol split with Spark's `split(w, "")` semantics:
      // symbols are CODE POINTS (UTF8String iterates code points, so
      // a surrogate pair is ONE symbol), and the empty word yields one
      // empty symbol (→ −1). NOTE this differs from Java's
      // `String.split("")`, which splits BETWEEN surrogates on this
      // JVM — a charAt walk (or the Java split) would shred
      // supplementary characters (emoji, CJK ext-B) into unmatched
      // half-surrogates and break bit-compatibility with the composed
      // form and the trainer (ADVICE r8).
      val syms =
        if (w.isEmpty) Array("")
        else {
          val arr = new Array[String](w.codePointCount(0, w.length))
          var ci = 0
          var off = 0
          while (off < w.length) {
            val cc = Character.charCount(w.codePointAt(off))
            arr(ci) = w.substring(off, off + cc)
            ci += 1
            off += cc
          }
          arr
        }
      var n = syms.length
      // replay merges in rank order: single left-to-right pass each
      var r = 0
      while (r < nm) {
        val a = ma(r); val b = mb(r); val ab = mab(r)
        var write = 0
        var read = 0
        while (read < n) {
          val s = syms(read)
          if (write > 0 && syms(write - 1) == a && s == b) {
            syms(write - 1) = ab
          } else {
            syms(write) = s
            write += 1
          }
          read += 1
        }
        n = write
        r += 1
      }
      var si = 0
      while (si < n) {
        val id = idOf.get(syms(si))
        out.add(if (id == null) Integer.valueOf(-1) else id)
        si += 1
      }
      wi += 1
    }
    val ids = new Array[Int](out.size)
    var i = 0
    while (i < ids.length) { ids(i) = out.get(i).intValue(); i += 1 }
    new GenericArrayData(ids)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
