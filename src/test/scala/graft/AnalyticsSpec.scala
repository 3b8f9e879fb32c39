package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-twin contracts for the rows-only analytics queries (A13/A14):
  * the driver records rows>0 for these, so their correctness lives
  * here (SURVEY §6). */
class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("A50: bloomReduceJoin is bit-identical to the plain join, false positives included") {
    import spark.implicits._
    val fact = (1L to 2000L).map(k => (k, k % 7)).toDF("fk", "payload")
    val dim = (1L to 2000L by 5).map(k => (k, s"d$k")).toDF("dk", "name")
    // expectedDimRows=64 for 400 real keys → deliberately undersized
    // bloom → real false positives, so the exact-join cleanup path is
    // exercised, not just the happy path
    val got = operators.Analytics.bloomReduceJoin(fact, dim, "fk", "dk", 64L)
      .select("fk", "payload", "dk", "name").orderBy("fk").collect().toSeq
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "dk", "name").orderBy("fk").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("A51: join-size estimate is exact on the truth side and never undershoots") {
    import spark.implicits._
    val r = Seq(Some(1L), Some(1L), Some(2L), Some(3L), Some(3L), Some(3L), None)
      .toDF("k")
    val s = Seq(Some(1L), Some(2L), Some(2L), Some(4L), None).toDF("k2")
    // truth: k=1 → 2·1, k=2 → 1·2, k=3/4 unmatched, NULLs join nothing
    val row = operators.Analytics.joinSizeEstimate(r, "k", s, "k2").collect().head
    assert(row.getLong(1) == 4L, "exact pair count")
    assert(row.getLong(0) >= row.getLong(1), "CM estimate must upper-bound truth")
    assert(row.getLong(2) == row.getLong(0) - row.getLong(1))
  }

  test("A50: bloom capacity tracks the dim cardinality — FPP holds where the r9 constant eroded") {
    import spark.implicits._
    val n = 30000L
    val dim = spark.range(n).select(col("id").as("k"))
    val nonMembers = spark.range(n, 2 * n).select(col("id").as("k"))
    // auto-sized: capacity = counted dim rows → FPP stays near the 3%
    // default at ANY dim size
    val bfAuto = operators.Analytics.bloomFilterFor(dim, "k")
    val fpAuto = nonMembers
      .where(operators.Analytics.bloomMightContain(bfAuto, col("k"))).count()
    assert(fpAuto.toDouble / n < 0.06, s"auto-sized FPP too high: $fpAuto/$n")
    // the old fixed 4096 capacity at ~7x its design load: the filter
    // saturates and passes most non-members through — the erosion the
    // data-derived sizing removes
    val bfConst = operators.Analytics.bloomFilterFor(dim, "k", expectedDimRows = 4096L)
    val fpConst = nonMembers
      .where(operators.Analytics.bloomMightContain(bfConst, col("k"))).count()
    assert(fpConst > fpAuto * 5,
      s"expected the saturated constant-capacity filter to leak: $fpConst vs $fpAuto")
    // no false negatives either way
    assert(dim.where(!operators.Analytics.bloomMightContain(bfAuto, col("k"))).count() == 0)
  }

  test("A52: skew report ranks heavy keys with exact shares and uniform-excess factor") {
    import spark.implicits._
    // 10 rows of key a, 5 of b, 1 each of c,d,e (+ nulls, excluded)
    val df = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq("c", "d", "e"))
      .map(Option(_)).appended(None).toDF("k")
    val got = operators.Analytics.keySkewReport(df, "k", topK = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // 18 non-null rows, 5 keys; max 10 → skew = 10*5*1e6/18 = 2777777
    assert(got == Seq(
      (1, "a", 10L, 555555L, 18L, 5L, 2777777L),
      (2, "b", 5L, 277777L, 18L, 5L, 2777777L),
      (3, "c", 1L, 55555L, 18L, 5L, 2777777L)))
  }

  test("A53: join skew ranks by CONTRIBUTION — a both-sides-moderate key beats each side's top key") {
    import spark.implicits._
    // left: a×100, b×20, c×1   right: c×100, b×20, a×1 — 'a' tops the
    // left and 'c' tops the right, but the join is dominated by 'b'
    // (20·20=400 vs 100·1=100 for either side's champion). This is why
    // a per-side top-k union is NOT a correct candidate set and the
    // operator joins the full count relations.
    val l = (Seq.fill(100)("a") ++ Seq.fill(20)("b") ++ Seq("c")).toDF("k")
    val r = (Seq.fill(100)("c") ++ Seq.fill(20)("b") ++ Seq("a")).toDF("k2")
    def got(lf: org.apache.spark.sql.DataFrame, rf: org.apache.spark.sql.DataFrame) =
      operators.Analytics.joinSkewReport(lf, "k", rf, "k2", topK = 2).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3),
          x.getLong(4), x.getLong(5), x.getLong(6))).toSeq
    // totals: 400 + 100 + 100 = 600; shares floor to micros
    val want = Seq(
      (1L, "b", 20L, 20L, 400L, 666666L, 600L),
      (2L, "a", 100L, 1L, 100L, 166666L, 600L))
    assert(got(l, r) == want)
    // keyed rollups + key-sized join — scan order cannot matter
    assert(got(l.repartition(7), r.repartition(3)) == want)
  }

  test("A51: fully disjoint key sets estimate 0 pairs, not NULL (true count-min)") {
    import spark.implicits._
    val r = Seq(1L, 2L, 3L).toDF("k")
    val s = Seq(100L, 200L).toDF("k2")
    // disjoint keys CAN still collide in buckets, so only assert the
    // tight case when no hash row overlaps; with d=4 rows of w=1024
    // buckets and 6 keys, est is exact-0 unless a collision lands —
    // either way est_pairs must be non-null and >= true_pairs (=0)
    val row = operators.Analytics.joinSizeEstimate(r, "k", s, "k2").collect().head
    assert(!row.isNullAt(0), "empty bucket overlap must estimate 0, not NULL")
    assert(row.getLong(1) == 0L)
    assert(row.getLong(0) >= 0L)
  }

  test("A22: funnel fold handles ordering, ties and partial stages on a crafted log") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // u1 completes in order; u2's click PRECEDES its first view (stage 1);
    // u3's purchase ties the click's timestamp exactly (strict > → stage 2);
    // u4 has a click tying its view's timestamp (strict > → stage 1);
    // u5 never views (stage 0); u6 completes using the SECOND click
    // (first click is pre-view) and ignores funnel-external types
    val rows = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(1), "view"), (3L, ts(2), "click"), (3L, ts(2), "purchase"),
      (4L, ts(1), "view"), (4L, ts(1), "click"),
      (5L, ts(1), "click"), (5L, ts(2), "purchase"),
      (6L, ts(1), "click"), (6L, ts(2), "view"), (6L, ts(3), "error"),
      (6L, ts(4), "click"), (6L, ts(5), "purchase"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("event_id", col("user_id") * 100)
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_").toString
    rows.write.mode("overwrite").parquet(dir + "/events.parquet")
    val got = operators.Analytics.eventsFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(4))).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0, 6L -> 3))
    // u6's completion uses the post-view click
    val u6 = operators.Analytics.eventsFunnel(spark, dir)
      .filter(col("user_id") === 6L).collect().head
    assert(u6.getTimestamp(2) == ts(4) && u6.getTimestamp(3) == ts(5))
  }

  test("A24: Q13 histogram lands no-match customers in the k=0 bucket") {
    import spark.implicits._
    // c1: two non-urgent orders (k=2); c2: ONLY urgent orders — the outer
    // join must keep it with count 0, not drop it; c3: no orders at all.
    val cust = Seq((1L, "a", 0, 10.0, "B"), (2L, "b", 0, 10.0, "B"), (3L, "c", 1, 10.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val ord = Seq(
      (10L, 1L, "O", 5.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "2-HIGH"),
      (11L, 1L, "O", 5.0, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "3-MEDIUM"),
      (12L, 2L, "O", 5.0, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("graft_q13_").toString
    cust.write.parquet(dir + "/customer.parquet")
    ord.write.parquet(dir + "/orders.parquet")
    val got = operators.Analytics.q13OrderDistribution(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 2L, 2L -> 1L))
  }

  test("A25: Q22 boundary — strictly-above-average, urgent holders excluded") {
    import spark.implicits._
    // positive balances 100,200,250,300,400 → avg exactly 250. Strict >
    // keeps 300 and 400 only; 250 sits ON the boundary and must drop out;
    // the -50 customer is excluded from the average but still a candidate;
    // the 400 customer holds an urgent order → anti-joined away.
    val cust = Seq(
      (1L, "a", 0, 100.0, "B"), (2L, "b", 0, 200.0, "B"), (6L, "f", 0, 250.0, "B"),
      (3L, "c", 2, 300.0, "B"), (5L, "e", 3, 400.0, "B"), (4L, "d", 1, -50.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val ord = Seq(
      (10L, 5L, "O", 5.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("graft_q22_").toString
    cust.write.parquet(dir + "/customer.parquet")
    ord.write.parquet(dir + "/orders.parquet")
    val got = operators.Analytics.q22GlobalBalance(spark, dir).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2))))
    assert(got.toSeq == Seq((2, (1L, 300.0))))
  }

  test("A23: daily cohort retention on a crafted log") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-0$day $h%02d:00:00")
    // u1 cohorts on day 1, returns days 2 and 3; u2 cohorts on day 1,
    // skips day 2, returns day 3 (two events that day collapse to one
    // active-day row); u3 cohorts on day 2 only.
    val rows = Seq(
      (1L, ts(1, 9)), (1L, ts(2, 9)), (1L, ts(3, 9)),
      (2L, ts(1, 12)), (2L, ts(3, 8)), (2L, ts(3, 20)),
      (3L, ts(2, 7)))
      .toDF("user_id", "ts")
      .withColumn("event_id", col("user_id") * 100)
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_retention_").toString
    rows.write.mode("overwrite").parquet(dir + "/events.parquet")
    val got = operators.Analytics.eventsRetention(spark, dir).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L, 1.0), ("2024-01-01", 1, 1L, 0.5), ("2024-01-01", 2, 2L, 1.0),
      ("2024-01-02", 0, 1L, 1.0)))
  }

  test("A28: RANGE frame admits same-day ties together and drops day-7 edges") {
    import spark.implicits._
    def d(s: String) = java.sql.Timestamp.valueOf(s"2024-01-$s 00:00:00")
    // c1: day 8 sits exactly 7 days after day 1 — the trailing-6 frame of
    // day 8 covers days 2..8, so day 1 must drop out; the two day-20
    // orders TIE on the order-by value, so each row's frame contains BOTH
    // (RANGE, not ROWS — peer rows enter together) regardless of row
    // order. c2 pins partition isolation.
    val ord = Seq(
      (1L, 101L, d("01"), 10.0), (1L, 102L, d("02"), 20.0),
      (1L, 103L, d("08"), 40.0),
      (1L, 104L, d("20"), 5.0), (1L, 105L, d("20"), 7.0),
      (2L, 201L, d("01"), 100.0))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_rangeframe_").toString
    ord.write.parquet(dir + "/orders.parquet")
    val got = operators.Analytics.windowRangeFrame(spark, dir).collect()
      .map(r => (r.getLong(1), (r.getDouble(3), r.getLong(4))))
    assert(got.toSeq == Seq(
      101L -> (10.0, 1L), 102L -> (30.0, 2L), 103L -> (60.0, 2L),
      104L -> (12.0, 2L), 105L -> (12.0, 2L), 201L -> (100.0, 1L)))
  }

  test("A27: PIT join picks the version valid at event time, half-open at the change boundary") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // key 1 (< 100) changes segment AAA→MOVED at 2024-01-15: an event
    // BEFORE sees AAA, AT the boundary instant sees MOVED (validity is
    // half-open [from, to)), AFTER sees MOVED. key 500 never changes.
    // key 999 has no dim row and key 500's 2023 event predates every
    // version — both must audit as NONE, not drop (LEFT join).
    val cust = Seq((1L, "a", 0, 1.0, "AAA"), (500L, "b", 0, 1.0, "BBB"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val ev = Seq(
      (1L, ts("2024-01-10 12:00:00"), 1.0),
      (1L, ts("2024-01-15 00:00:00"), 2.0),
      (1L, ts("2024-01-20 12:00:00"), 4.0),
      (500L, ts("2024-01-20 12:00:00"), 8.0),
      (500L, ts("2023-12-31 23:59:59"), 16.0),
      (999L, ts("2024-01-20 12:00:00"), 32.0))
      .toDF("user_id", "ts", "value")
      .withColumn("event_id", col("user_id") * 10)
      .withColumn("event_type", lit("view")).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_pit_").toString
    cust.write.parquet(dir + "/customer.parquet")
    ev.write.parquet(dir + "/events.parquet")
    val got = operators.CoreQueries.temporalPitJoin(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
    assert(got.toSeq == Seq(
      "AAA" -> (1L, 1.0), "BBB" -> (1L, 8.0),
      "MOVED" -> (2L, 6.0), "NONE" -> (2L, 48.0)))
  }

  test("A13: approx_count_distinct error stays within 3×rsd at sf0.01 and sf0.1") {
    // HLL++ default rsd = 0.05; the rows-only driver entry's explicit
    // guarantee (VERDICT r5 #7): relative error ≤ 3σ per group at both
    // verification scales, not just "rows > 0".
    val rsd = 0.05
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val got = operators.Analytics.approxDistinct(spark, dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = GraftSession.table(spark, dir, "events")
        .groupBy("event_type").agg(countDistinct(col("user_id")).as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.keySet == exact.keySet)
      got.foreach { case (k, approx) =>
        val d = exact(k)
        assert(math.abs(approx - d) <= math.max(1L, (d * 3 * rsd).toLong),
          s"$dir/$k: approx $approx vs exact $d exceeds 3×rsd=$rsd")
      }
    }
  }

  test("A13: approx_count_distinct tracks the exact distinct count per group") {
    val got = operators.Analytics.approxDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = GraftSession.table(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (k, (approx, n)) =>
      val (d, nExact) = exact(k)
      assert(n == nExact, s"plain count must be exact for $k")
      // HLL++ default rsd = 5%; allow 3 sigma
      assert(math.abs(approx - d) <= math.max(1L, (d * 0.15).toLong),
        s"approx $approx too far from exact $d for $k")
    }
  }

  test("A14: hash sampling is deterministic and a true subset") {
    val s1 = operators.Analytics.sampleHash(spark, sfDir).collect().toSeq
    val s2 = operators.Analytics.sampleHash(spark, sfDir).collect().toSeq
    assert(s1 == s2, "sample must be a pure function of the keys")
    val full = GraftSession.table(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = s1.map(r => r.getString(0) -> r.getLong(1)).toMap
    sampled.foreach { case (k, n) =>
      val total = full(k)
      assert(n <= total)
      // ~10% of each group, loose 3x bounds for small groups
      assert(n >= total / 30 && n <= total * 3 / 10 + 10,
        s"sample rate off for $k: $n of $total")
    }
  }

  test("A45: HLL sketches union exactly to the direct sketch; estimates near exact") {
    val ev = GraftSession.table(spark, sfDir, "events")
    // mergeability: per-(type, day) sketches unioned per type must give
    // the SAME estimate as sketches built directly per type (register
    // merge is associative — identical sketch state)
    val cells = operators.Analytics.distinctSketches(
      ev.withColumn("day", to_date(col("ts"))), Seq("event_type", "day"), "user_id")
    val viaUnion = operators.Analytics.sketchEstimate(cells, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = operators.Analytics.sketchEstimate(
        operators.Analytics.distinctSketches(ev, Seq("event_type"), "user_id"),
        Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaUnion == direct, "unioned sketches diverged from the direct build")
    // accuracy: default HLL (lgK=12) is well under 5% at this cardinality
    val exact = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (ty, n) =>
      val est = viaUnion(ty)
      assert(math.abs(est - n).toDouble / n < 0.05, s"$ty: est $est vs exact $n")
    }
  }

  test("A45b portable KMV: small groups exact, large within the k=64 error bound; k-smallest merge = full sketch") {
    import org.apache.spark.sql.expressions.Window
    val ev = GraftSession.table(spark, sfDir, "events")
    val got = operators.Analytics.distinctKmvPortable(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val exact = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (ty, nHashes, _, est) =>
      val n = exact(ty)
      if (nHashes < 64) assert(est == n, s"$ty: below-k group must be exact ($est vs $n)")
      else assert(math.abs(est - n).toDouble / n < 0.4, // 3σ ≈ 3/√62
        s"$ty: KMV est $est vs exact $n beyond the k=64 bound")
    }
    // mergeability: the k smallest of (half A's sketch ∪ half B's
    // sketch) is exactly the full corpus's sketch — the KMV merge rule
    val h = ev.select(col("event_type"), col("user_id"),
      conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long").as("h"))
    val w = Window.partitionBy("event_type").orderBy("h")
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "h").distinct()
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 64).drop("rn")
    val merged = sketch(sketch(h.filter(pmod(col("user_id"), lit(2)) === 0))
        .unionByName(sketch(h.filter(pmod(col("user_id"), lit(2)) === 1))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val full = sketch(h).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged == full, "merged half-sketches diverged from the full KMV sketch")
  }

  test("A44: z-score anomaly flags exactly the injected spike day") {
    val out = operators.Analytics.eventsAnomaly(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.nonEmpty)
    // contract checks on the real table: flag ⇔ |z| > 2, and within each
    // type the z-scores sum to ~0 (population z over the type's days)
    out.foreach { case (_, _, _, z, flag) => assert(flag == (math.abs(z) > 2.0)) }
    out.groupBy(_._1).foreach { case (ty, rows) =>
      val zsum = rows.map(_._4).sum
      assert(math.abs(zsum) < 1e-3, s"$ty z-scores sum to $zsum, expected ~0")
    }
    // crafted spike: 9 calm days + one 100× day must flag only the spike
    import spark.implicits._
    val base = (0 until 10).flatMap { d =>
      val v = if (d == 7) 1000.0 else 10.0
      Seq((d.toLong, java.sql.Timestamp.valueOf(f"2024-02-${d + 1}%02d 12:00:00"), 1L, "m", v, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_a44_").toString
    base.write.parquet(s"$dir/events.parquet")
    val crafted = operators.Analytics.eventsAnomaly(spark, dir).collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getBoolean(4)))
    assert(crafted.length == 10)
    assert(crafted.count(_._3) == 1, "exactly the spike day must flag")
    assert(crafted.find(_._3).get._2 == 1000.0)
  }

  test("A48 profile: nulls, distincts and exact means on a crafted table; one scan with Expand") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some(1.0), Some(0.5)), (Some(2.0), None),
      (None, None), (Some(2.0), Some(1.5)))
      .toDF("a", "b")
    val got = operators.Analytics.profileNumeric(df, Seq("a", "b")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    // mean(a) = 5/3 → 16667 half-up micros-of-1e-4 → 1.6667
    assert(got == Seq(
      ("a", 3L, 1L, 2L, 1.0, 2.0, 1.6667),
      ("b", 2L, 2L, 2L, 0.5, 1.5, 1.0)))
    // plan shape on the real table: ONE parquet scan; the multi-column
    // distinct counts ride it through one Expand, never per-column scans
    val prof = operators.Analytics.profileNumeric(
      GraftSession.table(spark, sfDir, "lineitem"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    prof.collect()
    val plan = prof.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1,
      s"profile re-scanned the table:\n$plan")
    assert(plan.contains("Expand"), s"multi-distinct did not plan as Expand:\n$plan")
  }

  test("A47 trend: exact OLS slope on a crafted linear series; flat series slope 0") {
    import spark.implicits._
    // type "up": value = 5 + 3·d per day (one event/day) → slope exactly 3;
    // type "fl": constant 7 → slope exactly 0
    val base = (0 until 10).flatMap { d =>
      val ts = java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00")
      Seq((d.toLong, ts, 1L, "up", 5.0 + 3 * d, "{}"),
        (100L + d, ts, 1L, "fl", 7.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_a47_").toString
    base.write.parquet(s"$dir/events.parquet")
    val got = operators.Analytics.eventsTrend(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("fl", 10L, 0.0), ("up", 10L, 3.0)))
    // the real table: one row per type with ≥2 days, finite slopes
    val real = operators.Analytics.eventsTrend(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }

  test("A46 quantile sketch: merge-identical, within the 1/16 relative bound of exact, partition-invariant") {
    import org.apache.spark.sql.functions._
    import operators.Analytics
    val ev = GraftSession.table(spark, sfDir, "events").cache()
    // merge identity: (type, day) cells summed up to type ≡ direct type sketch
    val direct = Analytics.sketchQuantiles(
        Analytics.valueSketch(ev, Seq("event_type")), Seq("event_type"))
      .orderBy("event_type").collect().toSeq
    val merged = Analytics.sketchQuantiles(
        Analytics.valueSketch(ev.withColumn("day", to_date(col("ts"))),
          Seq("event_type", "day")), Seq("event_type"))
      .orderBy("event_type").collect().toSeq
    assert(direct == merged)
    assert(direct.nonEmpty)
    // error bound vs the quantity the sketch approximates — the exact
    // ceil-rank (disc) percentile d: the estimate is d's bucket's upper
    // bound, so est ≥ d always and est < d·17/16 for values ≥ 32 (the
    // m ≥ 16 sub-bucket geometry)
    val byType = ev.select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (ty, vs) => ty -> vs.map(_._2).sorted }
    def disc(sorted: Array[Double], qNum: Int, qDen: Int): Double = {
      val n = sorted.length.toLong
      sorted(((qNum * n + qDen - 1) / qDen - 1).toInt)
    }
    direct.foreach { r =>
      val ty = r.getString(0)
      val s = byType(ty).toArray
      Seq(r.getDouble(3) -> disc(s, 1, 2), r.getDouble(4) -> disc(s, 9, 10),
        r.getDouble(5) -> disc(s, 99, 100)).foreach { case (est, d) =>
        assert(est >= d - 1e-9, s"$ty estimate $est below the disc rank $d")
        assert(est <= d * 17.0 / 16 + 1e-9,
          s"$ty estimate $est above the bucket bound of disc $d")
      }
    }
    // sketch size is bucket-bounded, far below the value cardinality
    val nBins = direct.map(_.getLong(2)).max
    assert(nBins < 400, s"sketch too large: $nBins bins")
    // exact integer arithmetic → identical under any partitioning
    val re = Analytics.sketchQuantiles(
        Analytics.valueSketch(ev.repartition(7), Seq("event_type")),
        Seq("event_type")).orderBy("event_type").collect().toSeq
    assert(re == direct)
  }

  test("A49 window dedup: one survivor per (user, type, hour) and it is the (ts, event_id) minimum") {
    import graft.operators.Analytics
    val got = Analytics.eventsDedupWindow(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getString(1), r.getTimestamp(2)),
        (r.getTimestamp(4), r.getLong(3))))
    val all = GraftSession.table(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), date_trunc("hour", col("ts")),
        col("ts"), col("event_id")).collect()
      .map(r => ((r.getLong(0), r.getString(1), r.getTimestamp(2)),
        (r.getTimestamp(3), r.getLong(4))))
    // the op is non-vacuous on this corpus (some window holds a re-fire)
    assert(got.length < all.length, "no duplicate events — dedup vacuous")
    // exactly one survivor per key, and it is the group's minimum
    val want = all.groupBy(_._1).view
      .mapValues(_.map(_._2).minBy(v => (v._1.getTime, v._2))).toMap
    assert(got.length == want.size)
    got.foreach { case (k, v) =>
      assert(v == want(k), s"kept $v for $k, expected ${want(k)}")
    }
  }
}
