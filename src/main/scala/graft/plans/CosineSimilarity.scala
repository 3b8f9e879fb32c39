package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native one-pass cosine similarity over two numeric arrays, with
  * whole-stage codegen.
  *
  * Replaces the composed higher-order form
  * `aggregate(zip_with(a,b,_*_),0,_+_) / (sqrt(dot(a,a))*sqrt(dot(b,b)))`
  * — Spark's HOFs (`ArrayTransform`/`ZipWith`/`ArrayAggregate`) are
  * CodegenFallback, so the composed form runs INTERPRETED with three
  * lambda-driven array traversals and two intermediate arrays per row.
  * This expression is one fused loop (dot and both norms accumulate
  * together), zero allocation, inside the stage's generated code —
  * it sits in every ANN scoring loop, so the per-pair cost is the
  * operator cost.
  *
  * Bit-compatibility contract (the oracles depend on it): the fold
  * order is IDENTICAL to the composed form — dot, na, nb are each a
  * left-to-right sequential IEEE-double sum, and the final expression
  * is dot / (sqrt(na) * sqrt(nb)) in that operation order. Null
  * semantics also match the composed form: a null array, mismatched
  * lengths (zip_with pads with null), or any null element → null.
  * One deliberate divergence: a zero-norm input yields NaN here (raw
  * IEEE 0/0), where the composed form RAISES under ANSI division —
  * unreachable on real embeddings and strictly more forgiving.
  * PlansSpec pins native ≡ composed bit-for-bit on everything else,
  * nulls included.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if (lt == DoubleType || lt == FloatType) && (rt == DoubleType || rt == FloatType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> inputs, got $other")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    val n = ad.numElements()
    if (bd.numElements() != n) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (ad.isNullAt(i) || bd.isNullAt(i)) return null
      val x = if (lf) ad.getFloat(i).toDouble else ad.getDouble(i)
      val y = if (rf) bd.getFloat(i).toDouble else bd.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val a = ctx.freshName("a")
    val b = ctx.freshName("b")
    val n = ctx.freshName("n")
    val bad = ctx.freshName("bad")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val i = ctx.freshName("i")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
    val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
    ev.copy(code = code"""
      ${lg.code}
      ${rg.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${lg.isNull} && !${rg.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${lg.value};
        org.apache.spark.sql.catalyst.util.ArrayData $b = ${rg.value};
        int $n = $a.numElements();
        if ($b.numElements() == $n) {
          boolean $bad = false;
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            double $x = $getX;
            double $y = $getY;
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          if (!$bad) {
            ${ev.isNull} = false;
            ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
          }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd dot product — the [[CosineSimilarity]] loop without
  * the norms. Same bit-compatibility contract: left-to-right sequential
  * IEEE sum (≡ the composed `aggregate(zip_with(a,b,_*_),0,_+_)`), same
  * null propagation (null array / length mismatch / null element →
  * null). Sits under the sign-LSH bucketing (nPlanes dots per corpus
  * row) and any caller of Vectors.dot. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if (lt == DoubleType || lt == FloatType) && (rt == DoubleType || rt == FloatType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> inputs, got $other")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    val n = ad.numElements()
    if (bd.numElements() != n) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (ad.isNullAt(i) || bd.isNullAt(i)) return null
      val x = if (lf) ad.getFloat(i).toDouble else ad.getDouble(i)
      val y = if (rf) bd.getFloat(i).toDouble else bd.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val a = ctx.freshName("a")
    val b = ctx.freshName("b")
    val n = ctx.freshName("n")
    val bad = ctx.freshName("bad")
    val dot = ctx.freshName("dot")
    val i = ctx.freshName("i")
    val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
    val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
    ev.copy(code = code"""
      ${lg.code}
      ${rg.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${lg.isNull} && !${rg.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${lg.value};
        org.apache.spark.sql.catalyst.util.ArrayData $b = ${rg.value};
        int $n = $a.numElements();
        if ($b.numElements() == $n) {
          boolean $bad = false;
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            $dot += ($getX) * ($getY);
          }
          if (!$bad) { ${ev.isNull} = false; ${ev.value} = $dot; }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd EXACT integer dot product over two `array<long>`
  * columns — the fixed-point twin of [[DotProduct]], sitting under
  * every portable integer-distance path (k-means assignment, portable
  * IVF/PQ quantization, SemDeDup's cluster scoping, diverse sampling):
  * those compute |a|² + |b|² − 2·a·b per (row, seed) from long dots,
  * and the composed `aggregate(zip_with(...))` form runs INTERPRETED
  * (both HOFs are CodegenFallback) with an intermediate array per
  * (row, seed). This is one fused allocation-free loop in the stage's
  * generated code. Exactness is free: integer addition is associative,
  * so ANY evaluation order gives the identical long — the
  * bit-compatibility contract the fixed-point oracles rely on needs no
  * fold-order clause here. Null array / length mismatch / null element
  * → null (the zip_with contract). */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(org.apache.spark.sql.types.LongType, _),
          ArrayType(org.apache.spark.sql.types.LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got $other")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_long"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    val n = ad.numElements()
    if (bd.numElements() != n) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (ad.isNullAt(i) || bd.isNullAt(i)) return null
      dot += ad.getLong(i) * bd.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val a = ctx.freshName("a")
    val b = ctx.freshName("b")
    val n = ctx.freshName("n")
    val bad = ctx.freshName("bad")
    val dot = ctx.freshName("dot")
    val i = ctx.freshName("i")
    ev.copy(code = code"""
      ${lg.code}
      ${rg.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${lg.isNull} && !${rg.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${lg.value};
        org.apache.spark.sql.catalyst.util.ArrayData $b = ${rg.value};
        int $n = $a.numElements();
        if ($b.numElements() == $n) {
          boolean $bad = false;
          long $dot = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            $dot += $a.getLong($i) * $b.getLong($i);
          }
          if (!$bad) { ${ev.isNull} = false; ${ev.value} = $dot; }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}
