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

  test("CosineSimilarity is bit-identical to the composed HOF form, nulls included") {
    import graft.functions.Vectors
    val rnd = new scala.util.Random(42)
    val dims = Seq(1, 2, 64, 65)
    // no zero vector here: under ANSI the composed form THROWS on the
    // 0/0 norm division while the native returns NaN (strictly more
    // forgiving — and unreachable on real embeddings); the equality
    // contract covers every non-degenerate input
    val vecs = dims.flatMap { d =>
      (0 until 8).map(_ => Seq.fill(d)(rnd.nextDouble() * 2 - 1))
    }
    val pairs = for (a <- vecs; b <- vecs if a.length == b.length) yield (a, b)
    val df = pairs.toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("native"),
        Vectors.cosineComposed(col("a"), col("b")).as("composed"))
    df.collect().foreach { r =>
      val (n, c) = (r.getDouble(0), r.getDouble(1))
      // bit equality, not epsilon: the fold order is identical by contract
      assert(java.lang.Double.doubleToRawLongBits(n) == java.lang.Double.doubleToRawLongBits(c),
        s"native $n != composed $c")
    }
    // null-propagation contract matches zip_with padding semantics:
    // mismatched lengths, null element, null array → null in BOTH forms
    val edge = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(1.0)))),             // length mismatch
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),       // null element
      (None, Some(Seq(Some(1.0)))))                                        // null array
      .toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("native"),
        Vectors.cosineComposed(col("a"), col("b")).as("composed"))
      .collect()
    edge.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1), s"expected null/null, got $r"))
    // float32 input path (the raw embeddings type) agrees with the
    // cast-to-double composed path
    val f = Seq((Seq(1.5f, -2.25f, 0.5f), Seq(0.25f, 1.0f, -3.5f))).toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("native"),
        Vectors.cosineComposed(Vectors.toDouble(col("a")), Vectors.toDouble(col("b"))).as("composed"))
      .collect()(0)
    assert(java.lang.Double.doubleToRawLongBits(f.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(f.getDouble(1)))
    // the native dot obeys the same fold-order contract
    val d = pairs.toDF("a", "b")
      .select(Vectors.dot(col("a"), col("b")).as("native"),
        Vectors.dotComposed(col("a"), col("b")).as("composed"))
      .collect()
    d.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("LongDot equals the composed integer fold; nulls propagate; big values exact") {
    val rnd = new scala.util.Random(11)
    val dims = Seq(1, 2, 64, 65)
    val vecs = dims.flatMap { d =>
      (0 until 6).map(_ => Seq.fill(d)(rnd.nextLong() % 1048576L))
    }
    val pairs = for (a <- vecs; b <- vecs if a.length == b.length) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(graft.plans.GraftFunctions.dotLong(col("a"), col("b")).as("native"),
        graft.similarity.Ann.dotLComposed(col("a"), col("b")).as("composed"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // JVM-exact too (the oracles' ground truth)
    pairs.zip(got).foreach { case ((a, b), r) =>
      assert(r.getLong(0) == a.zip(b).map { case (x, y) => x * y }.sum)
    }
    // null propagation: length mismatch, null element, null array
    val edge = Seq(
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(1L)))),
      (Some(Seq(Some(1L), None)), Some(Seq(Some(1L), Some(2L)))),
      (None, Some(Seq(Some(1L)))))
      .toDF("a", "b")
      .select(graft.plans.GraftFunctions.dotLong(col("a"), col("b")).as("native"),
        graft.similarity.Ann.dotLComposed(col("a"), col("b")).as("composed"))
      .collect()
    edge.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1), s"expected null/null, got $r"))
  }

  test("FloorScale equals the composed floor-transform, negatives, exact halves and nulls included") {
    val rnd = new scala.util.Random(13)
    // negatives exercise floor-vs-truncate; exact power-of-two values
    // exercise the boundary where floor(x·2^20) is an integer already
    val vecs = (0 until 40).map(_ => Seq.fill(16)(rnd.nextDouble() * 4 - 2)) ++
      Seq(Seq(0.0, -0.5, 0.5, -1.0, 1.0, 1.0 / 1048576, -1.0 / 1048576, 0.25))
    val got = vecs.toDF("v")
      .select(graft.plans.GraftFunctions.floorScale(col("v"), 1048576L).as("native"),
        graft.similarity.Ann.intVecComposed(col("v")).as("composed"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"native/composed diverged: $r")
    }
    // JVM-exact too (the oracles' ground truth)
    vecs.zip(got).foreach { case (v, r) =>
      assert(r.getSeq[Long](0) == v.map(x => math.floor(x * 1048576L).toLong))
    }
    // float input widens exactly like the composed cast chain
    val f = Seq(Seq(0.5f, -0.25f, 1.5f)).toDF("v")
      .select(graft.plans.GraftFunctions.floorScale(col("v"), 1048576L).as("native"),
        graft.similarity.Ann.intVecComposed(col("v").cast("array<double>")).as("composed"))
      .collect()(0)
    assert(f.getSeq[Long](0) == f.getSeq[Long](1))
    // null array → null; null element → null element (both forms)
    val edge = Seq((Option.empty[Seq[Option[Double]]], 1),
        (Some(Seq(Some(1.5), None, Some(-2.5))), 2))
      .toDF("v", "tag")
      .select(col("tag"), graft.plans.GraftFunctions.floorScale(col("v"), 1048576L).as("native"),
        graft.similarity.Ann.intVecComposed(col("v")).as("composed"))
      .collect().sortBy(_.getInt(0))
    assert(edge(0).isNullAt(1) && edge(0).isNullAt(2))
    assert(edge(1).getSeq[Any](1) == edge(1).getSeq[Any](2) &&
      edge(1).getSeq[Any](1)(1) == null)
  }

  test("NearestCentroid equals the composed argmin, first-min tie-break included") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    val cents = Seq.fill(5)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    // duplicate an interior centroid: any vector nearest to it produces
    // an exact distance TIE between index 2 and index 5 — both forms
    // must resolve to the FIRST index
    val withDup = cents :+ cents(2)
    val vecs = (0 until 60).map(_ => Seq.fill(dim)(rnd.nextDouble() * 2 - 1)) ++ cents
    val got = vecs.toDF("v")
      .select(graft.plans.GraftFunctions.nearestCentroid(col("v"), withDup).as("n"),
        graft.similarity.Ann.nearestClusterComposed(col("v"), withDup).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    got.foreach { case (n, c) => assert(n == c, s"native $n != composed $c") }
    // the exact-hit on the duplicated centroid is present and resolves to 2
    assert(got.exists(_._1 == 2) && !got.map(_._1).contains(5))
    // dimension mismatch → null in both forms
    val bad = Seq(Seq(1.0, 2.0)).toDF("v")
      .select(graft.plans.GraftFunctions.nearestCentroid(col("v"), withDup).as("n"),
        graft.similarity.Ann.nearestClusterComposed(col("v"), withDup).as("c"))
      .collect()(0)
    assert(bad.isNullAt(0) && bad.isNullAt(1))
  }

  test("C41d: KmvDistinct aggregate == the composed portable KMV query (A45b twin), registers round-trip") {
    import spark.implicits._
    // synthetic groups: 'big' has >64 distinct users (estimator regime),
    // 'small' has 5 (exact regime), duplicates everywhere
    val rows = (0 until 400).map(i => ("big", s"u${i % 200}")) ++
      (0 until 40).map(i => ("small", s"s${i % 5}"))
    val df = rows.toDF("event_type", "user_id")
    val viaAgg = df.groupBy("event_type")
      .agg(GraftFunctions.kmvDistinct(col("user_id"), 64).as("est_distinct"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaQuery = graft.operators.Analytics.distinctKmvPortable(df, 64)
      .select(col("event_type"), col("est_distinct"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaAgg == viaQuery,
      s"bounded-buffer aggregate and distinct+window query disagree: $viaAgg vs $viaQuery")
    // estimate-from-registers == direct estimate (the serving path)
    val viaSketch = df.groupBy("event_type")
      .agg(GraftFunctions.kmvEstimate(
        GraftFunctions.kmvSketch(col("user_id"), 64), 64).as("est_distinct"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSketch == viaAgg)
    // the small group is EXACT (KMV's below-k contract)
    assert(viaAgg.find(_._1 == "small").map(_._2).contains(5L))
    // merge of split sketches == whole sketch (exact set algebra)
    val half1 = df.filter(col("user_id").substr(2, 10).cast("int") % 2 === 0)
    val half2 = df.filter(col("user_id").substr(2, 10).cast("int") % 2 === 1)
    val whole = df.groupBy("event_type")
      .agg(GraftFunctions.kmvSketch(col("user_id"), 64).as("s"))
    val merged = half1.groupBy("event_type")
      .agg(GraftFunctions.kmvSketch(col("user_id"), 64).as("s"))
      .unionByName(half2.groupBy("event_type")
        .agg(GraftFunctions.kmvSketch(col("user_id"), 64).as("s")))
      .groupBy("event_type").agg(GraftFunctions.kmvMerge(col("s"), 64).as("s"))
    def rows64(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("event_type").collect()
        .map(r => (r.getString(0), r.getSeq[Long](1))).toSeq
    assert(rows64(merged) == rows64(whole),
      "KMV union must equal the whole's registers exactly")
    // the JVM hash equals Spark SQL's zero-clamped
    // greatest(conv(substring(md5(s),1,8),16,10), 1) — the 0→1 mapping
    // keeps the estimator's divisor nonzero on both engines
    val sqlHash = df.select(
        greatest(conv(substring(md5(col("user_id")), 1, 8), 16, 10).cast("long"),
          lit(1L)).as("h")).collect()
    val jvmHash = df.select(col("user_id")).collect().map(r =>
      graft.plans.KmvCore.hash32(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))))
    assert(sqlHash.map(_.getLong(0)).toSeq == jvmHash.toSeq)
  }

  test("KMV zero-register guard: hash32 clamps to ≥1, a forced 0 register cannot divide by zero") {
    import graft.plans.KmvCore
    // hash32 is clamped at insert: no string may hash to 0 (the md5
    // whose first four bytes are zero maps to 1 — the estimator's
    // divisor is the kth register and must stay nonzero)
    val rnd = new scala.util.Random(0xC41D)
    (0 until 20000).foreach { i =>
      val s = org.apache.spark.unsafe.types.UTF8String.fromString(
        rnd.alphanumeric.take(1 + (i % 24)).mkString + i)
      val h = KmvCore.hash32(s)
      assert(h >= 1L && h <= 0xffffffffL, s"hash32 out of clamped range: $h")
    }
    // second line of defense: a register array carrying a literal 0
    // (e.g. handed in from outside the sketch builders) estimates via
    // the clamped divisor instead of throwing ArithmeticException
    val k = 4
    val forced = Array(0L, 1L, 2L, 3L) // kth (index k-1) nonzero, 0 present
    assert(KmvCore.estimateOf(forced, k) == 3L * 4294967296L / 3L)
    val zeroKth = Array(0L, 0L, 0L, 0L)
    assert(KmvCore.estimateOf(zeroKth, k) == 3L * 4294967296L) // divisor clamps to 1
    // estimate stays the exact count below k regardless of content
    assert(KmvCore.estimateOf(Array(0L, 5L), k) == 2L)
  }
}
