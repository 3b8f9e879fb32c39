package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Contamination, Dedup}
import graft.similarity.Ann

/** Approximate operators asserted against their exact twins
  * (SURVEY §6: minhash/simhash/LSH are rows-only for the driver, so the
  * correctness contract lives here). */
class DedupAnnSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val docs = GraftSession.table(spark, sfDir, "documents").cache()
  private lazy val emb = GraftSession.table(spark, sfDir, "embeddings").cache()

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH pairs are verified-correct (subset) with high recall vs exact jaccard") {
    val exact = pairSet(Dedup.ngramJaccardPairs(docs))
    val mh = pairSet(Dedup.minhashLshPairs(docs))
    assert(mh.subsetOf(exact), "minhash emitted a pair the exact twin rejects")
    assert(exact.nonEmpty)
    assert(mh.size >= math.ceil(exact.size * 0.8).toInt,
      s"recall ${mh.size}/${exact.size} below 0.8")
  }

  test("portable twins: verified-correct with the same guarantees as the xxhash operators") {
    // same contracts as the xxhash variants: minhash emits only pairs
    // the exact twin accepts (verification is exact jaccard) with high
    // recall; simhash catches every strong near-duplicate. Holding BOTH
    // variants to the same bars guards the portable hash ingredients
    // against silent quality regressions.
    val exact = pairSet(Dedup.ngramJaccardPairs(docs))
    val mhP = pairSet(Dedup.minhashLshPairsPortable(docs))
    assert(mhP.subsetOf(exact), "portable minhash emitted a pair the exact twin rejects")
    assert(mhP.size >= math.ceil(exact.size * 0.8).toInt,
      s"portable minhash recall ${mhP.size}/${exact.size} below 0.8")
    val strong = pairSet(Dedup.ngramJaccardPairs(docs, tau = 0.9))
    val shP = pairSet(Dedup.simhashPairsPortable(docs))
    assert(strong.subsetOf(shP), "a >=0.9-jaccard pair is missing from portable simhash output")
    // the portable families union tags exactly its components' pairs
    val famsP = Dedup.familiesPairsPortable(docs).select("family", "a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(famsP.filter(_._1 == "minhash").map(t => (t._2, t._3)) == mhP)
    assert(famsP.filter(_._1 == "simhash").map(t => (t._2, t._3)) == shP)
    assert(famsP.filter(_._1 == "jaccard").map(t => (t._2, t._3)) == exact)
  }

  test("substring dup stats: scale path equals portable path, stats internally consistent") {
    val fast = Dedup.substringDupStats(docs).orderBy("doc_id").collect()
    val portable = Dedup.substringDupStats(docs, hash64 = false).orderBy("doc_id").collect()
    assert(fast.sameElements(portable),
      "xxhash64 and md5 window-hash paths disagree (collision or logic drift)")
    assert(fast.length == docs.count())
    var anyDup = false
    fast.foreach { r =>
      val (nTok, nWin) = (r.getLong(1), r.getLong(2))
      val (dupWin, nSpans, dupTok) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nWin == math.max(nTok - 7, 0L))
      assert(dupWin <= nWin && dupTok <= nTok && nSpans <= dupWin)
      // a span of m merged windows covers between m + k - 1 and m * k
      // tokens — violated only by a broken island merge
      if (nSpans > 0) { anyDup = true; assert(dupTok >= dupWin + 7 * nSpans) }
      assert(dupTok <= dupWin * 8)
    }
    assert(anyDup, "test corpus has cross-doc duplicate windows; none detected")
  }

  test("substring dup stats mark exactly the duplicated-span positions on a crafted corpus") {
    import spark.implicits._
    // B repeats A's 10-token prefix; C is disjoint. k=8 → A and B share
    // windows at positions 1..3 (one merged span of 10 tokens each).
    val a = (1 to 10).map(i => s"w$i").mkString(" ") + " alpha beta gamma delta"
    val b = (1 to 10).map(i => s"w$i").mkString(" ") + " epsilon zeta eta theta"
    val c = (101 to 114).map(i => s"u$i").mkString(" ")
    val crafted = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = Dedup.substringDupStats(crafted).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq ==
      Seq((1L, 3L, 1L, 10L), (2L, 3L, 1L, 10L), (3L, 0L, 0L, 0L)))
  }

  test("simhash finds every strong near-duplicate") {
    val strong = Dedup.ngramJaccardPairs(docs, tau = 0.9)
    val sh = pairSet(Dedup.simhashPairs(docs))
    assert(pairSet(strong).subsetOf(sh), "a >=0.9-jaccard pair is missing from simhash output")
  }

  test("familiesPairs from one shared pass equals the standalone operators") {
    def tagged(df: org.apache.spark.sql.DataFrame, fam: String): Set[(String, Long, Long)] =
      df.select("a_id", "b_id").collect().map(r => (fam, r.getLong(0), r.getLong(1))).toSet
    val fams = Dedup.familiesPairs(docs).select("family", "a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = tagged(Dedup.ngramJaccardPairs(docs), "jaccard") ++
      tagged(Dedup.minhashLshPairs(docs), "minhash") ++
      tagged(Dedup.simhashPairs(docs), "simhash")
    assert(fams == want, s"shared-pass union diverged: ${fams.diff(want)} / ${want.diff(fams)}")
  }

  test("adaptive df-cut: a floor above every df equals the uncut exact jaccard") {
    // minDf larger than any per-block df → nothing is cut on either path
    val uncut = Dedup.ngramJaccardPairs(docs, maxDf = Int.MaxValue)
    val adaptive = Dedup.ngramJaccardPairsAdaptive(docs, minDf = Int.MaxValue)
    assert(pairSet(adaptive) == pairSet(uncut))
    assert(pairSet(adaptive).nonEmpty)
  }

  test("adaptive df-cut: the approx-percentile scale knob selects the same pairs") {
    // the 100 TB form (percentile_approx sketch, no sort) must agree
    // with the oracle-mirrored exact percentile at high accuracy on the
    // verification corpus — same threshold, same pairs
    val exact = Dedup.ngramJaccardPairsAdaptive(docs)
    val approx = Dedup.ngramJaccardPairsAdaptive(docs, exactQuantile = false)
    assert(pairSet(approx) == pairSet(exact))
    assert(pairSet(approx).nonEmpty)
  }

  test("clusters: multi-hop chains collapse to the minimum reachable id") {
    import spark.implicits._
    // chain 1-2-3-4 (needs 3 propagation rounds) + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a_id", "b_id")
    val got = Dedup.clusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 1L, false), (10L, 10L, true), (11L, 10L, false)))
  }

  test("clusters on the corpus label every paired doc exactly once") {
    val pairs = Dedup.ngramJaccardPairs(docs)
    val cl = Dedup.clusters(pairs)
    val members = pairs.select("a_id").union(pairs.select("b_id")).distinct().count()
    assert(cl.count() == members)
    assert(cl.select("doc_id").distinct().count() == members)
  }

  test("clusters with a reliable checkpoint dir equal the local-checkpoint path") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a_id", "b_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(norm(Dedup.clusters(pairs, checkpointDir = Some(dir))) == norm(Dedup.clusters(pairs)))
    assert(norm(Dedup.clustersAltStar(pairs, checkpointDir = Some(dir))) ==
      norm(Dedup.clustersAltStar(pairs)))
    // the reliable path actually wrote checkpoint data to shared storage
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(_.toFile.isFile).count()
    assert(wrote > 0, "reliable checkpoint must materialize to the checkpoint dir")
  }

  test("eval set fully contained in train is 100% contaminated") {
    import org.apache.spark.sql.functions.col
    val eval = docs.filter(col("doc_id") < 50)
    val out = Contamination.overlap(docs, eval).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("contamination") == 1.0, s"doc ${r.getLong(0)} not fully contaminated")
      assert(r.getAs[Boolean]("flagged"))
    }
  }

  test("alternating-star clustering equals label propagation; chains converge in log rounds") {
    import spark.implicits._
    def labeled(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Boolean)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // long chain 1-2-...-60: label propagation needs ~diameter rounds,
    // alternating star must finish within a log-ish budget
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val viaStar = labeled(Dedup.clustersAltStar(chain, maxIter = 12))
    assert(viaStar == (1L to 60L).map(i => (i, 1L, i == 1L)).toSet)
    // corpus pair graph: identical labeling to the default operator
    val pairs = Dedup.ngramJaccardPairs(docs).persist()
    assert(labeled(Dedup.clustersAltStar(pairs)) == labeled(Dedup.clusters(pairs)))
  }

  test("cross-corpus pairs equal the full operator restricted to cross-side pairs") {
    import org.apache.spark.sql.functions._
    val cross = Dedup.crossCorpusPairs(
        docs.filter(col("doc_id") % 7 =!= 0), docs.filter(col("doc_id") % 7 === 0))
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"), col("jaccard"))
    val full = Dedup.ngramJaccardPairs(docs)
      .filter((col("a_id") % 7 === 0) =!= (col("b_id") % 7 === 0))
    assert(cross.count() > 0)
    Equality.compareDfs(cross, full)
  }

  test("incremental clustering equals a full rebuild, including cluster merges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // corpus pairs arriving as an old batch + a delta
    val pairs = Dedup.ngramJaccardPairs(docs).persist()
    val oldB = pairs.filter((col("a_id") + col("b_id")) % 3 =!= 0)
    val newB = pairs.filter((col("a_id") + col("b_id")) % 3 === 0)
    assert(norm(Dedup.clustersIncremental(Dedup.clusters(oldB), newB)) ==
      norm(Dedup.clusters(pairs)))
    // a delta that merges two old clusters AND introduces brand-new docs
    val old2 = Seq((1L, 2L), (10L, 11L), (20L, 21L)).toDF("a_id", "b_id")
    val new2 = Seq((2L, 10L), (100L, 101L)).toDF("a_id", "b_id")
    assert(norm(Dedup.clustersIncremental(Dedup.clusters(old2), new2)) ==
      norm(Dedup.clusters(old2.unionByName(new2))))
    // untouched cluster {20,21} survives verbatim inside that equality;
    // an empty delta is the identity
    assert(norm(Dedup.clustersIncremental(Dedup.clusters(old2),
      Seq.empty[(Long, Long)].toDF("a_id", "b_id"))) == norm(Dedup.clusters(old2)))
  }

  test("contamination index: incremental store-table build equals the direct gate") {
    import org.apache.spark.sql.functions.col
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_cidx_").toString)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    // two incremental loads: the PK-keyed upsert keeps the set distinct
    Contamination.saveIndex(store, "cont_idx", train.filter(col("doc_id") % 2 === 0))
    Contamination.saveIndex(store, "cont_idx", train.filter(col("doc_id") % 2 === 1))
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val got = Contamination
      .overlapWithIndex(Contamination.loadIndex(store, "cont_idx"), eval)
      .orderBy("doc_id").collect().toSeq
    val want = Contamination.overlap(train, eval).orderBy("doc_id").collect().toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("exact dedup keeps the minimum id per distinct content") {
    val out = Dedup.exact(docs)
    assert(out.count() == docs.select("text").distinct().count())
  }

  test("LSH ANN scores agree exactly with brute force on overlapping pairs; ranks are valid") {
    import org.apache.spark.sql.functions.col
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val bf = Ann.topKBruteForce(emb, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val lsh = Ann.topKLsh(emb, queries).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bf.get(key).foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-12))
    }
    // ranks are 1..k strictly increasing per query with descending scores
    lsh.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(3) >= b.getDouble(3); case _ => true
      })
    }
  }

  test("portable LSH ANN matches brute-force scores on overlaps and stays deterministic") {
    import org.apache.spark.sql.functions.col
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val bf = Ann.topKBruteForce(emb, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val p1 = Ann.topKLshPortable(emb, queries).collect()
    assert(p1.nonEmpty)
    // candidate scores are the exact cosine — identical to brute force
    p1.foreach { r =>
      bf.get((r.getLong(0), r.getLong(1)))
        .foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-12))
    }
    // bucketing is a pure function of the data: re-running is bit-identical
    val p2 = Ann.topKLshPortable(emb, queries).collect()
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
  }

  test("IVF ANN: deterministic training, exact scores on candidates, recall over probe budget") {
    import org.apache.spark.sql.functions.col
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val bf = Ann.topKBruteForce(emb, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val cents1 = Ann.trainIvfCentroids(emb, nCentroids = 8, iters = 3)
    val cents2 = Ann.trainIvfCentroids(emb, nCentroids = 8, iters = 3)
    assert(cents1 == cents2, "k-means training is not deterministic")
    val ivf = Ann.topKIvf(emb, queries, nCentroids = 8, nProbe = 4).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      bf.get((r.getLong(0), r.getLong(1)))
        .foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-12))
    }
    // probing half the lists must recover a good share of the true top-k
    val hits = ivf.count(r => bf.contains((r.getLong(0), r.getLong(1))))
    assert(hits >= bf.size / 4, s"IVF recall too low: $hits/${bf.size}")
    // full probe budget degrades to exact brute force
    val full = Ann.topKIvf(emb, queries, nCentroids = 8, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == bf.keySet, "nProbe = nCentroids must equal brute force")
  }

  test("portable IVF ANN: exact scores on candidates, full probe budget equals brute force, deterministic") {
    import org.apache.spark.sql.functions.col
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val bf = Ann.topKBruteForce(emb, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val p1 = Ann.topKIvfPortable(emb, queries).collect()
    assert(p1.nonEmpty)
    // candidate scores are the exact cosine — identical to brute force
    p1.foreach { r =>
      bf.get((r.getLong(0), r.getLong(1)))
        .foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-12))
    }
    // probing a quarter of the lists must recover a good share of top-k
    val hits = p1.count(r => bf.contains((r.getLong(0), r.getLong(1))))
    assert(hits >= bf.size / 4, s"portable IVF recall too low: $hits/${bf.size}")
    // hash-seeded quantizer + integer distances are a pure function of
    // the data: re-running is bit-identical
    val p2 = Ann.topKIvfPortable(emb, queries).collect()
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    // probing every list degrades to exact brute force
    val full = Ann.topKIvfPortable(emb, queries, nCentroids = 8, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == bf.keySet, "nProbe = nCentroids must equal brute force")
  }

  test("IVF quantizer round-trips through a store table") {
    import graft.store.TableStore
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ivf_store_").toString)
    val cents = Ann.trainIvfCentroids(emb, nCentroids = 8, iters = 3)
    Ann.saveCentroids(spark, store, "quantizer", cents)
    val loaded = Ann.loadCentroids(store, "quantizer")
    assert(loaded == cents, "centroids must round-trip exactly")
    // reuse skips retraining and yields identical results
    val fresh = Ann.topKIvf(emb, emb.limit(5), nCentroids = 8, iters = 3).collect().toSeq
    val reused = Ann.topKIvf(emb, emb.limit(5), nCentroids = 8,
      centroids = Some(loaded)).collect().toSeq
    assert(fresh == reused)
  }

  test("persisted IVF index: incremental growth equals a from-scratch build") {
    import graft.store.TableStore
    import org.apache.spark.sql.functions.col
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ivf_idx_").toString)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    // build on the old corpus, then grow by the new vectors only —
    // the quantizer is NOT retrained, so assignments must equal
    // assigning the full corpus against the same centroids
    val cents = Ann.saveIndex(spark, store, "ivf", old, nCentroids = 8, iters = 3)
    Ann.growIndex(store, "ivf", fresh)
    val viaIndex = Ann.topKIvfIndexed(store, "ivf", emb, emb.limit(5), nProbe = 3)
      .collect().toSeq
    val direct = Ann.topKIvf(emb, emb.limit(5), nCentroids = 8, nProbe = 3,
      centroids = Some(cents)).collect().toSeq
    assert(viaIndex.nonEmpty)
    assert(viaIndex == direct,
      "incrementally grown index must answer identically to a direct build")
  }

  test("embedding pairs are canonical (a_id < b_id) and above threshold") {
    val out = Dedup.embeddingPairs(emb, tau = 0.35).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.35)
    }
  }

  test("semantic dedup equals a local brute-force twin of the dominance rule") {
    val tau = 0.3
    val got = Dedup.semanticDedup(emb, nClusters = 8, tau = tau).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    // independent local twin: collect assignments + vectors, recompute the
    // within-cluster pair graph and the (dist desc, id asc) dominance rule
    val rows = Ann.portableAssignmentsDetailed(emb, nCentroids = 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2), r.getLong(3)))
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      var ip = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { ip += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(ip / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = rows.map { case (id, v, cl, dc) =>
      val dominated = rows.exists { case (id2, v2, cl2, dc2) =>
        id2 != id && cl2 == cl && cos6(v, v2) >= tau &&
          (dc2 > dc || (dc2 == dc && id2 < id))
      }
      id -> ((cl, !dominated))
    }.toMap
    assert(got == expected)
    assert(got.values.count(_._2) > 0 && got.values.count(!_._2) > 0,
      "threshold should be non-vacuous in both directions")
  }

  test("semantic dedup: dominance drops a full chain, keeping the farthest-from-seed end") {
    import spark.implicits._
    // one cluster; md5("1") < md5("2") < md5("3") lexicographically, so
    // vec 1 is the hash-sampled seed. Angles 0°/30°/60° at radii 3/2/1:
    // cos(1,2)=cos(2,3)=cos30≈0.866 ≥ 0.85, cos(1,3)=cos60=0.5 < 0.85.
    // Seed distances: d(3) > d(2) > d(1)=0, so 3 dominates 2 and 2
    // dominates 1 — BOTH 1 and 2 drop (the rule is one-pass dominance,
    // not kept-conditioned greedy: 1 stays dropped even though its
    // dominator 2 is itself dropped), and only the chain's
    // farthest-from-seed end survives.
    val rad = math.Pi / 180
    def vec(deg: Double, r: Double): Array[Float] =
      Array((r * math.cos(deg * rad)).toFloat, (r * math.sin(deg * rad)).toFloat)
    val df = Seq(
      (1L, vec(0, 3).toSeq, 0), (2L, vec(30, 2).toSeq, 0), (3L, vec(60, 1).toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    val got = Dedup.semanticDedup(df, nClusters = 1, tau = 0.85).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("L39 int8 quantization: reconstruction bound, exact code checksum, zero-vector identity") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f), 0),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f), 0),   // all-zero → scale 0, no NaNs
      (3L, Seq(-2.0f, 2.0f, 1.0f, -1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    val out = Ann.quantizeInt8(df).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))).toSeq
    val Seq(v1, v2, v3) = out
    // max|x| maps to ±127 exactly, so q_sum is derivable by hand:
    // v1 codes = [127, -64 (0.5/ (1/127) = 63.5 → half-away 64), 32, 0] → 95
    assert(v1 == ((1L, 0.007874, 95L, v1._4)))
    assert(v1._4 <= v1._2 / 2 + 1e-12, "reconstruction error exceeds scale/2")
    assert(v2 == ((2L, 0.0, 0L, 0.0)))
    // symmetric vector → codes cancel to 0; ±max reconstructs exactly
    assert(v3._3 == 0L && v3._2 == 0.015748)
    assert(v3._4 <= v3._2 / 2 + 1e-12)
  }

  test("L41 cluster-safe split: near-dups NEVER straddle splits; every doc assigned") {
    val out = Dedup.clusterSafeSplit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == docs.count())
    // the leakage guarantee: one split per cluster
    out.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cl straddles splits: ${members.map(_._3).distinct.toSeq}")
    }
    // pairs found by the near-dup pass land in the SAME split
    val split = out.map(o => o._1 -> o._3).toMap
    val pairs = Dedup.ngramJaccardPairs(docs)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"near-dups $a/$b split across ${split(a)}/${split(b)}")
    }
    // all three splits materialize at the default fractions on this corpus
    assert(out.map(_._3).distinct.toSet == Set("train", "val", "test"))
    // deterministic under re-run and input repartitioning
    val again = Dedup.clusterSafeSplit(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("L40 quality keeper: exactly one keeper per cluster, and it has the max score") {
    val out = Dedup.clustersQualityKeeper(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (cl, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, s"cluster $cl has ${keepers.length} keepers")
      val best = members.map(m => (-m._3, m._1)).min // max score, tie → min doc_id
      assert((-best._1, best._2) == ((keepers.head._3, keepers.head._1)),
        s"cluster $cl keeper is not the quality argmax")
    }
    // same component structure as the base clusterer — only the keeper
    // policy differs
    val base = Dedup.clustersAltStar(Dedup.ngramJaccardPairs(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.map(o => (o._1, o._2)).toMap == base)
  }

  test("L47 span removal cuts exactly the duplicated tokens; paths agree; stats consistent") {
    import spark.implicits._
    // docs 1 and 2 share an 8-token run; doc 3 is clean
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ")
    val crafted = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon zeta"),
      (3L, "nothing in common here at all with anyone")).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(crafted, k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out(0) == ((1L, 11L, 8L, "alpha beta gamma")))
    assert(out(1) == ((2L, 11L, 8L, "delta epsilon zeta")))
    assert(out(2) == ((3L, 8L, 0L, "nothing in common here at all with anyone")))
    // removed_tokens equals L32's dup_tokens doc-for-doc on the corpus
    val removed = Dedup.removeDupSpans(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val stats = Dedup.substringDupStats(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(removed == stats, "span cut must remove exactly the stats' dup_tokens")
    // md5 portable path identical to the xxhash64 scale path
    val md5Out = Dedup.removeDupSpans(docs, hash64 = false).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    val xxOut = Dedup.removeDupSpans(docs).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    assert(md5Out == xxOut)
  }

  // ── L43 product quantization ─────────────────────────────────────────

  private def embMap: Map[Long, Array[Double]] =
    emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0 // same fold order as the Spark aggregate (element order)
    var i = 0
    while (i < a.length) { val t = a(i) - b(i); acc += t * t; i += 1 }
    acc
  }

  private def argminFirst(ds: Seq[Double]): Int = {
    var best = 0
    var i = 1
    while (i < ds.length) { if (ds(i) < ds(best)) best = i; i += 1 }
    best
  }

  test("L43 PQ: deterministic codebooks, codes in range, ADC equals the definition exactly") {
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val books = Ann.trainPqCodebooks(emb, m = 4, ksub = 4, iters = 3)
    assert(books == Ann.trainPqCodebooks(emb, m = 4, ksub = 4, iters = 3),
      "PQ training is not deterministic")
    assert(books.length == 4 && books.forall(_.length == 4))
    val dsub = books.head.head.length
    val codes = Ann.pqEncode(emb, books).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    assert(codes.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 4)))
    // reference: codes by first-min argmin per subspace, ADC by table lookup
    val vecs = embMap
    val refCodes = vecs.map { case (id, v) =>
      id -> (0 until 4).map { j =>
        val sv = v.slice(j * dsub, (j + 1) * dsub)
        argminFirst(books(j).map(c => sqDist(sv, c.toArray)))
      }
    }
    assert(codes.map { case (id, c) => id -> c.toSeq } == refCodes)
    val got = Ann.topKPq(emb, queries, k = 5, codebooks = Some(books)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val qIds = queries.select("vec_id").collect().map(_.getLong(0))
    val refTop = qIds.flatMap { qid =>
      val qv = vecs(qid)
      val table = (0 until 4).map { j =>
        val sv = qv.slice(j * dsub, (j + 1) * dsub)
        books(j).map(c => sqDist(sv, c.toArray))
      }
      val scored = vecs.keys.filter(_ != qid).toSeq.map { nid =>
        val adc = (0 until 4).foldLeft(0.0)((a, j) => a + table(j)(refCodes(nid)(j)))
        (nid, adc)
      }.sortBy { case (nid, adc) => (adc, nid) }.take(5)
      scored.zipWithIndex.map { case ((nid, adc), i) =>
        (qid, nid, i + 1,
          BigDecimal(adc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    assert(got.sortBy(x => (x._1, x._3)).toSeq == refTop.sortBy(x => (x._1, x._3)).toSeq)
  }

  test("L43b portable PQ: exact integer twin, partition-invariant") {
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val got = Ann.topKPqPortable(emb, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.nonEmpty)
    // integer reference: md5-ordered seeds, floor(x·2^20) coordinates
    val vecs = embMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ints: Map[Long, Array[Long]] =
      vecs.view.mapValues(_.map(x => math.floor(x * 1048576).toLong)).toMap
    val seedIds = vecs.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(8)
    val dim = vecs.head._2.length
    val dsub = dim / 4
    def subv(v: Array[Long], j: Int) = v.slice(j * dsub, (j + 1) * dsub)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { val t = a(i) - b(i); acc += t * t; i += 1 }
      acc
    }
    val subSeeds = (0 until 4).map(j => seedIds.map(id => subv(ints(id), j)))
    val codes = ints.map { case (id, v) =>
      id -> (0 until 4).map(j => argminFirst(subSeeds(j).map(s => d2(subv(v, j), s).toDouble)))
    }
    val qIds = queries.select("vec_id").collect().map(_.getLong(0))
    val ref = qIds.flatMap { qid =>
      val table = (0 until 4).map(j => subSeeds(j).map(s => d2(subv(ints(qid), j), s)))
      vecs.keys.filter(_ != qid).toSeq
        .map { nid => (nid, (0 until 4).map(j => table(j)(codes(nid)(j))).sum) }
        .sortBy { case (nid, adc) => (adc, nid) }.take(5)
        .zipWithIndex.map { case ((nid, adc), i) => (qid, nid, i + 1, adc) }
    }
    assert(got.sortBy(x => (x._1, x._3)).toSeq == ref.sortBy(x => (x._1, x._3)).toSeq)
    val again = Ann.topKPqPortable(emb.repartition(7), queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(again.sortBy(x => (x._1, x._3)).toSeq == got.sortBy(x => (x._1, x._3)).toSeq)
  }

  test("L43d persisted IVF-PQ: index-only search equals the direct operator; growth keeps the model") {
    import graft.store.TableStore
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ivfpq_store_").toString)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    Ann.saveIndexPq(spark, store, "pq", emb)
    val viaIndex = Ann.topKIvfPqIndexed(store, "pq", queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
      .sortBy(x => (x._1, x._3))
    val direct = Ann.topKIvfPq(emb, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
      .sortBy(x => (x._1, x._3))
    assert(viaIndex == direct,
      "index-only answers must equal the direct operator under the same trained model")
    // growth: an 80%-trained index grown with the rest holds exactly the
    // assignments the STORED model gives every vector (no retrain drift)
    val store2 = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ivfpq_grow_").toString)
    Ann.saveIndexPq(spark, store2, "pq", emb.filter(col("vec_id") % 5 =!= 0))
    Ann.growIndexPq(store2, "pq", emb.filter(col("vec_id") % 5 === 0))
    val cents = Ann.loadCentroids(store2, "pq_centroids")
    val books = Ann.loadPqBooks(store2, "pq_books")
    val want = Ann.pqAssignments(emb, cents, books).collect()
      .map(_.toSeq).toSet
    val got = store2.readTable("pq_assign")
      .selectExpr("vec_id", "cast(cl as int) cl",
        "cast(c0 as int) c0", "cast(c1 as int) c1", "cast(c2 as int) c2", "cast(c3 as int) c3")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("portable persisted index: indexed answers equal the unindexed portable twins; grow never retrains") {
    import graft.store.TableStore
    val queries = emb.filter(col("vec_id") % 50 === 0)
    // IVF: a full-corpus save answers EXACTLY like the unindexed
    // portable twin (same hash-sampled seeds, same integer distances)
    val s1 = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_pivf_idx_").toString)
    Ann.saveIndexPortable(spark, s1, "ivf", emb)
    val viaIdx = Ann.topKIvfIndexedPortable(s1, "ivf", emb, queries)
      .collect().map(_.toSeq).toSeq
    val direct = Ann.topKIvfPortable(emb, queries).collect().map(_.toSeq).toSeq
    assert(viaIdx.nonEmpty && viaIdx == direct,
      "portable index-only answers must equal the unindexed portable twin")
    // IVF-PQ with every coarse list probed degenerates to the full-scan
    // portable PQ: same codes, same exact long ADC, same ranks
    val s2 = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_pivfpq_idx_").toString)
    Ann.saveIndexPqPortable(spark, s2, "pq", emb)
    val allProbes = Ann.topKIvfPqIndexedPortable(s2, "pq", queries, nProbe = 16)
      .collect().map(_.toSeq).toSeq
    val fullScan = Ann.topKPqPortable(emb, queries).collect().map(_.toSeq).toSeq
    assert(allProbes == fullScan,
      "probing all lists must equal the full-scan portable ADC")
    // growth contract: grow assigns under the STORED model — the seed
    // tables are untouched and a replayed grow is idempotent
    val s3 = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_pivf_grow_").toString)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    Ann.saveIndexPortable(spark, s3, "ivf", old, nCentroids = 8)
    val seedsBefore = s3.readTable("ivf_centroids", orderBy = Seq("cl", "pos"))
      .collect().map(_.toSeq).toSeq
    Ann.growIndexPortable(s3, "ivf", fresh)
    val assignAfter = s3.readTable("ivf_assign", orderBy = Seq("vec_id"))
      .collect().map(_.toSeq).toSeq
    Ann.growIndexPortable(s3, "ivf", fresh) // replay: idempotent upsert
    assert(s3.readTable("ivf_centroids", orderBy = Seq("cl", "pos"))
      .collect().map(_.toSeq).toSeq == seedsBefore, "grow must not retrain the quantizer")
    assert(s3.readTable("ivf_assign", orderBy = Seq("vec_id"))
      .collect().map(_.toSeq).toSeq == assignAfter, "replayed grow must be a no-op")
    assert(assignAfter.size == emb.count(), "every vector assigned after growth")
  }

  test("L43c IVF-PQ: candidates only from probed lists, ADC agrees with full-scan PQ") {
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val got = Ann.topKIvfPq(emb, queries, k = 5, nCentroids = 4, nProbe = 2,
      m = 4, ksub = 4, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val cents = Ann.trainIvfCentroids(emb, nCentroids = 4, iters = 3)
    val vecs = embMap
    def nearest(v: Array[Double]) = argminFirst(cents.map(c => sqDist(v, c.toArray)))
    def probes(v: Array[Double]) = cents.indices
      .sortBy(i => (sqDist(v, cents(i).toArray), i)).take(2).toSet
    got.foreach { case (q, n, _, _) =>
      assert(probes(vecs(q)).contains(nearest(vecs(n))),
        s"candidate $n for query $q is outside the probed lists")
    }
    // ADC values agree with the full-scan variant on shared pairs
    val books = Ann.trainPqCodebooks(emb, m = 4, ksub = 4, iters = 3)
    val full = Ann.topKPq(emb, queries, k = 50, codebooks = Some(books)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got.foreach { case (q, n, _, adc) =>
      full.get((q, n)).foreach(x => assert(x == adc, s"ADC mismatch for ($q,$n)"))
    }
  }

  test("L57 explain: one pair, its jaccard matches the pair relation, shingles distinct and informative") {
    val ex = Dedup.explainTopPair(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3), r.getLong(4)))
    assert(ex.nonEmpty)
    // exactly one pair explained, and it is the TOP pair by the ranking
    assert(ex.map(t => (t._1, t._2, t._3)).distinct.length == 1)
    val (a, b, j) = (ex.head._1, ex.head._2, ex.head._3)
    val top = Dedup.ngramJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .minBy(t => (-t._3, t._1, t._2))
    assert((a, b, j) == top)
    // the evidence is real: distinct informative shingles under the cut
    assert(ex.map(_._4).distinct.length == ex.length)
    assert(ex.forall(_._5 <= 128))
    Graft.clearOperatorCaches()
  }

  test("L55 threshold report equals an independent recompute; every candidate τ emits") {
    val taus = (6 to 19).map(_ * 50000L)
    val got = Dedup.thresholdReport(docs, taus).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == taus)
    val pairs = Dedup.ngramJaccardPairs(docs, tau = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1000000)))
    val best = (pairs.map(p => (p._1, p._3)) ++ pairs.map(p => (p._2, p._3)))
      .groupBy(_._1).map { case (id, js) => id -> js.map(_._2).max }
    got.foreach { case (t, nPairs, nDocs) =>
      assert(nPairs == pairs.count(_._3 >= t), s"pairs at tau=$t")
      assert(nDocs == best.count(_._2 >= t), s"docs at tau=$t")
    }
    assert(got.head._2 > 0, "floor threshold found no pairs — vacuous corpus")
    Graft.clearOperatorCaches()
  }

  test("L78 review queue: per-band top-k by md5 priority, multi-band, cut exercised, partition-invariant") {
    import spark.implicits._
    // crafted corpus inside ONE (lang, length-band) block: a 4-doc
    // near-identical cluster (6 high-band pairs — more than perBand=2,
    // so the cut fires) plus a mid-similarity pair in a LOWER band
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val crafted = Seq(
      (1L, base, "en", "s"),
      (2L, base, "en", "s"),
      (3L, base, "en", "s"),
      (4L, base, "en", "s"),
      (5L, "alpha beta gamma delta epsilon zeta nu xi omicron pi rho sigma", "en", "s"),
      (6L, "alpha beta gamma delta epsilon zeta nu xi fig grape lime mango", "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
    val pairs = Dedup.ngramJaccardPairs(crafted).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1000000)))
    // expected queue recomputed from the raw pairs with the operator's
    // published contract: 0.1-wide bands, md5("a:b") priority, top-2
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = pairs.groupBy { case (_, _, j) => j / 100000 * 100000 }
      .toSeq.flatMap { case (band, ps) =>
        ps.sortBy { case (a, b, _) => (md5hex(s"$a:$b"), a, b) }.take(2).zipWithIndex
          .map { case ((a, b, j), i) => (band, i + 1L, a, b, j) }
      }.sorted
    def got(df: org.apache.spark.sql.DataFrame) =
      Dedup.reviewQueue(df, perBand = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sorted
    val queue = got(crafted)
    assert(queue == want, s"queue diverged: $queue vs $want")
    assert(queue.map(_._1).distinct.size >= 2, "single band — stratification unexercised")
    assert(pairs.count(_._3 >= 900000) > 2, "top band not larger than perBand — cut unexercised")
    // hash priority is content-derived — scan order cannot matter
    assert(got(crafted.repartition(5)) == want)
  }

  test("L79 cost report: Σ C(df,2) recomputed in-memory; est+cut conserved across maxDf; partition-invariant") {
    def rows(maxDf: Int) = Dedup.dedupCostReport(docs, maxDf = maxDf).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val uncut = rows(Int.MaxValue)
    val cut = rows(2)
    assert(uncut.keySet == cut.keySet)
    // the cut conserves the quadratic mass: est(maxDf) + cutPairs(maxDf)
    // == est(∞), and the uncut report never cuts
    uncut.foreach { case (k, (nd, ns, est, cs, cp)) =>
      assert(cs == 0L && cp == 0L)
      val (nd2, ns2, est2, _, cp2) = cut(k)
      assert(nd2 == nd && ns2 == ns, s"block $k doc/shingle counts moved with maxDf")
      assert(est2 + cp2 == est, s"block $k quadratic mass not conserved")
    }
    // ground truth for one block family: recompute Σ C(df,2) in memory
    // from the corpus' raw shingles
    val shingleOcc: Seq[((String, Int), String)] =
      docs.select("doc_id", "lang", "n_chars", "text").collect().toSeq
        .filter(_.getString(3) != null)
        .flatMap { r =>
          val toks = r.getString(3).split(" ").toSeq
          if (toks.size < 3) Nil
          else toks.sliding(3).map(_.mkString(" ")).toSet.toSeq
            .map((s: String) => ((r.getString(1), (r.getLong(2) / 50).toInt), s))
        }
    val inMem: Map[(String, Int), Long] = shingleOcc
      .groupBy(x => x).map { case (k, v) => k -> v.length.toLong }.toSeq
      .groupBy(_._1._1)
      .map { case (blk, dfsSeq) =>
        blk -> dfsSeq.map { case (_, d) => d * (d - 1) / 2 }.sum }
    uncut.foreach { case (k, (_, _, est, _, _)) =>
      assert(est == inMem.getOrElse(k, 0L), s"block $k est_pairs != in-memory C(df,2) sum")
    }
    // one shingle pass + keyed rollups — scan order cannot matter
    assert(rows(2) == Dedup.dedupCostReport(docs.repartition(7), maxDf = 2)
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap)
    Graft.clearOperatorCaches()
  }

  test("L49 distributed k-means: k=1 degenerates to the global mean; Lloyd descends; partition-invariant") {
    // k=1: one iteration's centroid is the half-away-rounded mean of the
    // floor(x·2^20) integer coordinates, independently recomputed here
    val one = Ann.kmeansTrain(emb, k = 1, iters = 1).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    val vecs = embMap
    val n = vecs.size.toLong
    val dim = vecs.head._2.length
    val sums = Array.fill(dim)(0L)
    vecs.values.foreach { v =>
      var j = 0
      while (j < dim) { sums(j) += math.floor(v(j) * 1048576).toLong; j += 1 }
    }
    assert(one.length == dim)
    one.foreach { case (pos, cnt, c) =>
      assert(cnt == n)
      val s = sums(pos)
      val exp = java.lang.Long.signum(s) * ((2L * math.abs(s) + n) / (2L * n))
      assert(c == exp.toDouble / 1048576.0, s"pos $pos mean mismatch")
    }
    // Lloyd descends: total within-cluster SSE (against each iteration's
    // output centroids, measured over the raw doubles) never increases
    def sse(centDf: Array[(Int, Int, Double)]): Double = {
      val byCl = centDf.groupBy(_._1).map { case (cl, rows) =>
        cl -> rows.sortBy(_._2).map(_._3).toArray
      }
      vecs.values.map { v =>
        byCl.values.map(c => sqDist(v, c)).min
      }.sum
    }
    def run(df: org.apache.spark.sql.DataFrame, iters: Int) =
      Ann.kmeansTrain(df, k = 4, iters = iters).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val it1 = run(emb, 1)
    val it3 = run(emb, 3)
    def cents(rows: Array[(Int, Int, Long, Double)]) =
      rows.map(r => (r._1, r._2, r._4))
    assert(sse(cents(it1)) >= sse(cents(it3)) - 1e-6,
      s"Lloyd SSE rose: iters=1 ${sse(cents(it1))} -> iters=3 ${sse(cents(it3))}")
    // partition invariance: a different physical layout trains the
    // identical model — sizes included (exact integer arithmetic)
    assert(run(emb.repartition(7), 3).toSeq == it3.toSeq)
    Graft.clearOperatorCaches()
  }

  test("L49→L7b: the full-corpus-trained quantizer serves the IVF index") {
    val cents = Ann.kmeansCentroids(Ann.kmeansTrain(emb, k = 4, iters = 3))
    assert(cents.length == 4 && cents.forall(_.length == 64))
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val got = Ann.topKIvf(emb, queries, k = 5, nProbe = 2, centroids = Some(cents))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // every candidate comes from the query's 2 probed lists under THESE
    // centroids — the quantizer actually partitions the search
    val vecs = embMap
    def nearest(v: Array[Double]) = argminFirst(cents.map(c => sqDist(v, c.toArray)))
    def probes(v: Array[Double]) = cents.indices
      .sortBy(i => (sqDist(v, cents(i).toArray), i)).take(2).toSet
    got.foreach { case (q, n, _, _) =>
      assert(probes(vecs(q)).contains(nearest(vecs(n))),
        s"candidate $n for query $q outside the probed lists")
    }
    // full probe budget (nProbe = k) ⇒ exact brute-force answer
    val full = Ann.topKIvf(emb, queries, k = 5, nProbe = 4, centroids = Some(cents))
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1), r.getDouble(3))).toSet
    val brute = Ann.topKBruteForce(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1), r.getDouble(3))).toSet
    assert(full == brute)
    Graft.clearOperatorCaches()
  }

  test("L60 paragraph dedup: first occurrence wins corpus-wide and intra-doc; reassembly ordered") {
    import spark.implicits._
    // para = 2 tokens. doc 1: [a b][c d]; doc 2 shares [a b], keeps
    // [e f]; doc 3 is an exact copy of doc 1 → fully emptied; doc 4
    // duplicates ITS OWN paragraph → keeps the first only; doc 5 has
    // null text → absent from the output entirely
    val corpus = Seq(
      (1L, "a b c d"), (2L, "a b e f"), (3L, "a b c d"),
      (4L, "g h g h"), (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val want = Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "e f"),
      (3L, 2L, 0L, ""),
      (4L, 2L, 1L, "g h"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.paragraphDedup(df, para = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(run(corpus) == want)
    // partition-invariant (the winner rule is a global min, not
    // an order-dependent scan)
    assert(run(corpus.repartition(7)) == want)
    // short docs (< para tokens) are one paragraph of their own
    val short = Seq((1L, "a"), (2L, "a")).toDF("doc_id", "text")
    assert(run(short) == Seq((1L, 1L, 1L, "a"), (2L, 1L, 0L, "")))
  }

  test("L74 paragraph decontamination: eval paragraphs cut, clean docs untouched, emptied docs kept") {
    import spark.implicits._
    // para = 2. eval holds [a b] and [x y]; train doc 1 = [a b][c d]
    // (loses its first), doc 2 = [e f][g h] (clean, untouched), doc 3 =
    // [a b][x y] (fully contaminated → emptied, still reported)
    val train = Seq(
      (1L, "a b c d"), (2L, "e f g h"), (3L, "a b x y")).toDF("doc_id", "text")
    val evalSet = Seq((100L, "a b x y")).toDF("doc_id", "text")
    def run(t: org.apache.spark.sql.DataFrame) =
      Dedup.decontaminateParagraphs(t, evalSet, para = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val want = Seq(
      (1L, 2L, 1L, "c d"),
      (2L, 2L, 2L, "e f g h"),
      (3L, 2L, 0L, ""))
    assert(run(train) == want)
    // partition-invariant: the cut is a keyed anti-join, no scan order
    assert(run(train.repartition(5)) == want)
  }

  test("L65 paragraph near-dup: crafted fuzzy pair found, unrelated not, intra-doc reuse found, cap guard fires") {
    import spark.implicits._
    val p1 = (1 to 20).map(i => s"w$i").mkString(" ")
    val p1fuzz = ((1 to 19).map(i => s"w$i") :+ "CHANGED").mkString(" ")
    val p2 = (1 to 20).map(i => s"x$i").mkString(" ")
    val filler = (1 to 20).map(i => s"y$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$p1 $p2"),           // paragraphs [p1][p2]
      (2L, s"$p1fuzz $filler"),   // [≈p1][unique filler]
      (3L, s"$p2 $p2"),           // intra-doc exact reuse
      (4L, other)).toDF("doc_id", "text")
    val got = Dedup.paragraphNearDupPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    val keys = got.map(t => (t._1, t._2, t._3, t._4)).toSet
    assert(keys.contains((1L, 0, 2L, 0)), s"fuzzy paragraph pair missed: ${got.toSeq}")
    assert(keys.contains((1L, 1, 3L, 0)) && keys.contains((1L, 1, 3L, 1)),
      s"cross-doc exact paragraph pairs missed: ${got.toSeq}")
    assert(keys.contains((3L, 0, 3L, 1)), s"intra-doc reuse missed: ${got.toSeq}")
    assert(!keys.exists(k => k._1 == 4L || k._3 == 4L),
      s"unrelated doc paired: ${got.toSeq}")
    // exact pairs score 1.0; the fuzzy pair is strictly between tau and 1
    val fuzzy = got.find(t => (t._1, t._2, t._3, t._4) == ((1L, 0, 2L, 0))).get._5
    assert(fuzzy >= 0.3 && fuzzy < 1.0)
    assert(got.find(t => (t._1, t._2, t._3, t._4) == ((3L, 0, 3L, 1))).get._5 == 1.0)
    // the in-plan idxCap guard is a named failure, not silent id reuse
    val long3 = Seq((7L, s"$p1 $p2 $other")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.paragraphNearDupPairs(long3, idxCap = 2).collect()
    }
    assert(e.getMessage.contains("idxCap") ||
      Option(e.getCause).exists(_.getMessage.contains("idxCap")), e.getMessage)
    Graft.clearOperatorCaches()
  }

  test("L68 novelty equals an in-memory recompute; copies score zero, originals one") {
    val got = Dedup.noveltyScores(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    // in-memory twin: distinct 3-gram shingles per doc, corpus-wide df
    val sh = docs.select("doc_id", "text").collect().flatMap { r =>
      val t = r.getString(1).split(" ", -1)
      if (t.length < 3) Nil
      else t.sliding(3).map(g => (r.getLong(0), g.mkString(" "))).toSeq.distinct
    }
    val dfm = sh.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = sh.groupBy(_._1).view.mapValues { ss =>
      val n = ss.length.toLong
      val u = ss.count(s => dfm(s._2) == 1L).toLong
      (n, u, u * 1000000L / n)
    }.toMap
    assert(got == want)
    // crafted: a verbatim copy zeroes BOTH sides' novelty; a unique
    // doc scores the full 10^6
    import spark.implicits._
    val crafted = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "p q r s t")).toDF("doc_id", "text")
    val g2 = Dedup.noveltyScores(crafted).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(g2 == Map(1L -> 0L, 2L -> 0L, 3L -> 1000000L), s"$g2")
    Graft.clearOperatorCaches()
  }

  test("L67 source reuse: totals reconcile with paragraph dedup; shared overlap equals an in-memory recompute") {
    val got = Dedup.dedupRateBySource(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.nonEmpty && got.exists(_._3 > 0L), "no reuse found — report vacuous")
    // the per-source dup occurrences must sum to exactly what the
    // paragraph deduplicator deletes corpus-wide
    val pd = Dedup.paragraphDedup(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).sum == pd.map(t => t._1 - t._2).sum,
      "per-source dup total diverged from paragraphDedup's deletions")
    assert(got.map(_._2).sum == pd.map(_._1).sum)
    // shared-content overlap: in-memory recompute over the same
    // 20-token segmentation
    val segs = docs.select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).grouped(20)
        .map(w => (r.getString(0), w.mkString(" "))))
    val bySources = segs.distinct.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val wantShared = segs.distinct.groupBy(_._1).view.mapValues(_.count {
      case (_, p) => bySources(p).size > 1
    }.toLong).toMap
    got.foreach { case (src, _, _, dupM, nDist, nShared, sharedM) =>
      assert(nShared == wantShared(src), s"source $src shared count diverged")
      assert(sharedM == nShared * 1000000L / nDist)
      assert(dupM >= 0L && dupM <= 1000000L)
    }
    Graft.clearOperatorCaches()
  }

  test("L63 index stats: lists partition the corpus, shares/balance exact, empty cells reported") {
    val n = emb.count()
    val got = Ann.indexStats(emb, nCentroids = 16).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (0 until 16))
    assert(got.map(_._2).sum == n, "lists must partition the corpus exactly")
    got.foreach { case (_, nv, share, bal) =>
      assert(share == nv * 1000000L / n)
      assert(bal == nv * 16L * 1000000L / n)
    }
    // more cells than vectors forces empty lists — they must still
    // report (n = 0), not vanish: probe budget spent on them is wasted
    val tiny = emb.filter(col("vec_id") < 8)
    val sparse = Ann.indexStats(tiny, nCentroids = 16).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(sparse.length == 16 && sparse.map(_._2).sum == 8L)
    assert(sparse.exists(_._2 == 0L), "expected at least one empty cell")
    Graft.clearOperatorCaches()
  }

  test("L66 cluster quality: mean/max inertia equal the in-memory recompute over the exact assignment") {
    val detail = Ann.portableAssignmentsDetailed(emb, nCentroids = 16)
      .select("vec_id", "cl", "__dc").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    val got = Ann.clusterQuality(emb, nCentroids = 16).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).sum == detail.length.toLong)
    val want = detail.groupBy(_._1).view.mapValues { ds =>
      val dcs = ds.map(_._2)
      (dcs.length.toLong,
        (dcs.map(BigInt(_)).sum / dcs.length).toLong, // exact floor mean
        dcs.max)
    }.toMap
    got.foreach { case (cl, n, mean, mx) =>
      assert((n, mean, mx) == want(cl), s"cell $cl diverged")
    }
    // inertia is the elbow signal: more cells must not increase the
    // corpus-wide total (finer partitions only tighten assignments)
    def total(k: Int) = Ann.portableAssignmentsDetailed(emb, k)
      .agg(org.apache.spark.sql.functions.sum(
        col("__dc").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
      .head.getDecimal(0)
    assert(total(16).compareTo(total(4)) <= 0, "inertia rose with more cells")
    Graft.clearOperatorCaches()
  }

  test("L61b PQ recall: exact integer arithmetic, bounded, and the measurement is non-vacuous") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val got = Ann.annRecallPq(emb, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, kt, kh, rm) =>
      assert(kt == 5L && kh >= 0L && kh <= kt && rm == kh * 1000000L / kt)
    }
    // 4-subspace 3-bit codes on this corpus must neither be perfect
    // everywhere (quantization loss exists) nor useless everywhere
    assert(got.exists(_._3 < 5L), "PQ perfect on every query — loss measurement vacuous")
    assert(got.exists(_._3 > 0L), "PQ found nothing anywhere — harness broken")
    Graft.clearOperatorCaches()
  }

  test("L61 ANN recall: probing every list recovers brute force exactly; partial probing is bounded") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    // nProbe = nCentroids → the candidate set is the whole corpus, so
    // the 'approximate' path IS brute force and recall must be 10⁶
    val full = Ann.annRecall(emb, q, k = 5, nCentroids = 8, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(full.nonEmpty)
    full.foreach { case (qid, kt, kh, rm) =>
      assert(kt == 5L && kh == 5L && rm == 1000000L,
        s"query $qid: full probing must have perfect recall, got $kh/$kt")
    }
    // the driver configuration: hits bounded by truth, the micros
    // value is exactly the integer floor, and at least one query is
    // imperfect (otherwise the measurement is vacuous on this corpus)
    val part = Ann.annRecall(emb, q, k = 5, nCentroids = 16, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    part.foreach { case (_, kt, kh, rm) =>
      assert(kt == 5L && kh <= kt && rm == kh * 1000000L / kt)
    }
    assert(part.exists(_._3 < 5L), "every query perfect — recall harness vacuous")
    Graft.clearOperatorCaches()
  }

  test("L70 semantic contamination: exact copies flag, orthogonal evals stay clean, blockless evals report NULL") {
    import SparkTestSession.spark.implicits._
    val train = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val eval = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f), 0), // exact copy of train 1 → cosine 1.0
      (101L, Seq(0.0f, 0.0f, 1.0f), 0), // orthogonal to BOTH label-0 train vecs
      (102L, Seq(1.0f, 0.0f, 0.0f), 7)) // label 7 has no train rows → NULL match
      .toDF("vec_id", "embedding", "label")
    val got = graft.dedup.Contamination.semanticContamination(train, eval, tau = 0.9)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(3))).toSeq
    assert(got == Seq((100L, 1L, true), (101L, 1L, false), (102L, -1L, false)))
    // tie on cosine resolves to the SMALLER train id: eval 101 is
    // orthogonal to both train 1 and 2 (cosine 0.0 each) → best_train 1
  }
}
