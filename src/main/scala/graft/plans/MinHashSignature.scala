package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing all k MinHash values of a
  * pre-hashed shingle set in one tight fused loop, WITH whole-stage
  * codegen (`doGenCode`).
  *
  * This is the "drop to a custom Expression where built-ins can't
  * express it efficiently" case (SURVEY §7.1): the higher-order
  * `aggregate`+`transform` formulation is semantically identical but
  * evaluates interpreted with per-element boxing — ~2.5× slower at
  * sf0.1 and worse at scale. Here the inner loop is primitive-long
  * arithmetic the JIT can vectorize; hash parameters live in reference
  * arrays, not the expression tree, so plan analysis stays O(1) in k.
  *
  * Same (a·x + b) mod 2^31−1 family as [[graft.dedup.Dedup]]: inputs
  * are already reduced mod P, so products stay below 2^62 — no Long
  * overflow under ANSI mode.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_signature"

  @transient private lazy val as: Array[Long] = MinHashSignature.paramsA(k)
  @transient private lazy val bs: Array[Long] = MinHashSignature.paramsB(k)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        var j = 0
        while (j < k) {
          val h = (x * as(j) + bs(j)) % MinHashSignature.P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("graftMhA", as, "long[]")
    val bRef = ctx.addReferenceObj("graftMhB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $x = $c.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = ($x * $aRef[$j] + $bRef[$j]) % ${MinHashSignature.P}L;
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Modulus 2^31−1; universe and multipliers < 2^31 keep a·x+b < 2^62. */
  val P = 2147483647L
  def paramsA(k: Int): Array[Long] =
    Array.tabulate(k)(i => ((0x9E3779B97F4A7C15L * (2 * i + 1)) & Long.MaxValue) % (P - 2) + 1)
  def paramsB(k: Int): Array[Long] =
    Array.tabulate(k)(i => ((0xC2B2AE3D27D4EB4FL * (i + 1)) & Long.MaxValue) % (P - 1))
}
