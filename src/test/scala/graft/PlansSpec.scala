package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GraftFunctions, MinHashSignature}

/** Native codegen'd expressions checked against independent JVM-side
  * computations (not against another Spark expression). */
class PlansSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("MinHashSignature equals an independent scala computation") {
    val k = 63
    val data = Seq(Seq(17L, 999L, 123456789L), Seq(5L), Seq.empty[Long])
    val df = data.toDF("hx")
      .select(GraftFunctions.minhashSignature(col("hx"), k).as("sig"))
    val got = df.as[Seq[Long]].collect()

    val as = MinHashSignature.paramsA(k)
    val bs = MinHashSignature.paramsB(k)
    val want = data.map { xs =>
      (0 until k).map { j =>
        if (xs.isEmpty) Long.MaxValue
        else xs.map(x => (x * as(j) + bs(j)) % MinHashSignature.P).min
      }
    }
    assert(got.map(_.toSeq).toSeq == want)
  }

  test("MinHashSignature: identical sets → identical signatures; codegen and interpreted agree") {
    val df = Seq(Seq(1L, 2L, 3L), Seq(3L, 2L, 1L)).toDF("hx")
      .select(GraftFunctions.minhashSignature(col("hx"), 16).as("sig"))
    val rows = df.as[Seq[Long]].collect()
    assert(rows(0) == rows(1)) // order-independence (min is commutative)
    // interpreted path (nullSafeEval) must agree with codegen
    val interp = MinHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 2L, 3L), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)), 16)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(interp.toSeq == rows(0))
  }

  test("SpaceSaving: exact when capacity suffices; heavy hitter survives tiny capacity") {
    // skewed stream across many partitions (forces partial-buffer merges)
    val rows = (1 to 2000).map { i =>
      val term = if (i % 2 == 0) "hot" else s"cold${i % 97}"
      ("g", term)
    }
    val df = rows.toDF("g", "term").repartition(8)
    def top(capacity: Int, k: Int) = df.groupBy("g")
      .agg(GraftFunctions.topKByFreq(col("term"), k, capacity).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.term"), col("e.cnt"), col("e.max_err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // capacity ≥ distinct (98) → exact counts, zero error, exact ranking
    val exact = top(capacity = 256, k = 3)
    val want = rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(3)
    assert(exact.map(e => (e._1, e._2)).toSeq == want)
    assert(exact.forall(_._3 == 0L))
    // capacity 8 < distinct: the true heavy hitter (freq N/2 >> N/8)
    // must be reported first, its count within [true, true + max_err]
    val sketch = top(capacity = 8, k = 1)
    assert(sketch.head._1 == "hot")
    val trueHot = rows.count(_._2 == "hot").toLong
    assert(sketch.head._2 >= trueHot && sketch.head._2 - sketch.head._3 <= trueHot)
  }

  test("RollingHash equals an independent scala computation incl. unicode") {
    val data = Seq("abc", "", "héllo wörld", "汉字 text", "a" * 5000)
    val got = data.toDF("s").select(GraftFunctions.rollingHash(col("s")).as("fp"))
      .as[Long].collect().toSeq
    val want = data.map { s =>
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 257L + cp) % 2147483647L
        i += Character.charCount(cp)
      }
      h
    }
    assert(got == want)
  }
}
