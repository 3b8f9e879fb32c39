package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native fixed-point vector scaling: `array<double|float>` →
  * `array<bigint>` with every element `floor(x · scale)` — the
  * 2^20-scale integerization at the front of EVERY portable
  * assignment/probe path (IVF seeds, PQ codes, k-means, SemDeDup
  * clustering).
  *
  * Replaces the composed `transform(v, x => floor(x*scale).cast(long))`
  * — `ArrayTransform` is CodegenFallback, so the composed form runs
  * interpreted with a lambda dispatch and boxing per element, and it
  * was the last interpreted piece of the fixed-point paths after the
  * [[LongDot]] kernel (SURVEY §7 r7 next-steps #6). Here the loop is
  * primitive double→long arithmetic fused into whole-stage codegen.
  *
  * Bit-compatibility contract (the oracles depend on it): elementwise
  * value is `(long) Math.floor(x * scale)` — exactly Spark's
  * `Floor(Multiply(x, scale))` semantics for double input. Null
  * semantics match the composed form: null array → null; null element
  * → null element (only reachable when the child's element type is
  * nullable — the no-null common case compiles to a primitive long[]
  * loop with zero boxing). PlansSpec pins native ≡ composed.
  */
case class FloorScale(child: Expression, scale: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString(10)}")
  }

  private def childArray: ArrayType = child.dataType.asInstanceOf[ArrayType]
  private def isFloat: Boolean = childArray.elementType == FloatType

  override def dataType: DataType = ArrayType(LongType, containsNull = childArray.containsNull)
  override def prettyName: String = "graft_floor_scale"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (childArray.containsNull) {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          out(i) = java.lang.Math.floor(x * scale).toLong
        }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = java.lang.Math.floor(x * scale).toLong
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      if (childArray.containsNull) {
        s"""
           |int $n = $c.numElements();
           |Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$c.isNullAt($i)) {
           |    $out[$i] = (long) java.lang.Math.floor(((double) $c.$get($i)) * ${scale}L);
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      } else {
        s"""
           |int $n = $c.numElements();
           |long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = (long) java.lang.Math.floor(((double) $c.$get($i)) * ${scale}L);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      }
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FloorScale =
    copy(child = newChild)
}
