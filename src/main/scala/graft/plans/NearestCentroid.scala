package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen'd IVF coarse assignment: index of the nearest
  * centroid (squared euclidean, first index attaining the minimum).
  *
  * Replaces the composed
  * `array_position(d, array_min(d))` over
  * `transform(centsLit, c -> aggregate(zip_with(v,c,(a,b)->(a-b)^2),...))`
  * — a triple-nested higher-order stack that runs INTERPRETED
  * (CodegenFallback) per corpus row × nClusters, allocating a distance
  * array per row. This is the corpus-side quantizer assignment, so at
  * 100 TB it runs once per ingested vector; the native form is one
  * fused loop over a flattened centroid table held as a reference
  * object, zero allocation, inside whole-stage codegen.
  *
  * Bit-compatibility: each distance is the same left-to-right IEEE
  * fold (acc += (v_i - c_i)²); argmin with strict `<` keeps the FIRST
  * index attaining the min — exactly array_position(array_min)'s
  * tie-break. Null array, dimension mismatch, or any null element →
  * null, matching zip_with padding semantics. PlansSpec pins
  * native ≡ composed on random inputs including exact ties.
  */
case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  private val k = cents.length
  private val dim = if (cents.isEmpty) 0 else cents.head.length
  require(k > 0 && cents.forall(_.length == dim),
    "NearestCentroid requires a non-empty rectangular centroid table")

  @transient private lazy val flat: Array[Double] = cents.flatten.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == DoubleType || t == FloatType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val ad = a.asInstanceOf[ArrayData]
    if (ad.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (ad.isNullAt(i)) return null
      i += 1
    }
    val fl = isFloat
    var best = 0
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < k) {
      var d = 0.0
      var i2 = 0
      while (i2 < dim) {
        val x = if (fl) ad.getFloat(i2).toDouble else ad.getDouble(i2)
        val diff = x - flat(j * dim + i2)
        d += diff * diff
        i2 += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cg = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val a = ctx.freshName("a")
    val ok = ctx.freshName("ok")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val i2 = ctx.freshName("i2")
    val d = ctx.freshName("d")
    val diff = ctx.freshName("diff")
    val best = ctx.freshName("best")
    val bestD = ctx.freshName("bestD")
    val getX = if (isFloat) s"(double) $a.getFloat($i2)" else s"$a.getDouble($i2)"
    ev.copy(code = code"""
      ${cg.code}
      boolean ${ev.isNull} = true;
      int ${ev.value} = 0;
      if (!${cg.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $a = ${cg.value};
        if ($a.numElements() == $dim) {
          boolean $ok = true;
          for (int $i = 0; $i < $dim; $i++) {
            if ($a.isNullAt($i)) { $ok = false; break; }
          }
          if ($ok) {
            int $best = 0;
            double $bestD = Double.POSITIVE_INFINITY;
            for (int $j = 0; $j < $k; $j++) {
              double $d = 0.0;
              for (int $i2 = 0; $i2 < $dim; $i2++) {
                double $diff = ($getX) - $flatRef[$j * $dim + $i2];
                $d += $diff * $diff;
              }
              if ($d < $bestD) { $bestD = $d; $best = $j; }
            }
            ${ev.isNull} = false;
            ${ev.value} = $best;
          }
        }
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
