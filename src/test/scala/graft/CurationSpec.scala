package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Curation operators: the salted two-phase quota must be
  * indistinguishable from the naive single-window definition. */
class CurationSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val docs = GraftSession.table(spark, sfDir, "documents").cache()

  /** Code-point split — the engine's symbol alphabet (Spark
    * `split(s, "")` iterates code points; Java's `String.split("")`
    * shreds surrogate pairs on this JVM). Empty → one empty symbol. */
  private def cpSplit(s: String): Vector[String] =
    if (s.isEmpty) Vector("")
    else s.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  test("stratifiedCap equals the single-window reference selection") {
    val got = Curation.stratifiedCap(docs, "lang", "doc_id", cap = 30)
      .select("doc_id", "lang", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val ref = docs.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= 30)
      .select("doc_id", "lang", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == ref)
    assert(got.nonEmpty)
  }

  test("bm25 ranks by the exact formula on a crafted corpus, caps k, is partition-stable") {
    import spark.implicits._
    // 4 docs, query "apple pear": d1 has both terms, d2 one term twice
    // in a longer doc, d3 one term once, d4 neither
    val corpus = Seq(
      (1L, "apple pear plum"),
      (2L, "apple kiwi apple kiwi melon grape fig"),
      (3L, "pear melon grape"),
      (4L, "kiwi melon grape fig")).toDF("doc_id", "text")
    val q = Seq((1, "apple pear")).toDF("query_id", "qtext")
    val got = Curation.bm25TopK(corpus, q, k = 10).orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    // hand-computed: N=4, avgdl=17/4; df(apple)=2, df(pear)=2 → idf=ln(2)
    def contrib(tf: Double, dl: Double): Double = {
      val raw = math.log((4.0 - 2 + 0.5) / (2.0 + 0.5) + 1.0) *
        (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 4.25)))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = Seq(
      (1L, 2L, contrib(1, 3) + contrib(1, 3), 1),  // both terms, short doc
      (2L, 1L, contrib(2, 7), 2),                  // one term, tf=2, long doc
      (3L, 1L, contrib(1, 3), 3))                  // one term, tf=1
    assert(got.toSeq == expect)
    // doc 4 matches no term and is absent; k caps the output
    assert(!got.exists(_._1 == 4L))
    assert(Curation.bm25TopK(corpus, q, k = 2).count() == 2)
    // same result under a different input partitioning (decimal sum is
    // order-independent — the reason contributions aren't float-summed)
    val reGot = Curation.bm25TopK(corpus.repartition(7), q, k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(reGot.sameElements(got))
    // duplicate query terms count once
    val dup = Seq((1, "apple apple pear")).toDF("query_id", "qtext")
    val dupGot = Curation.bm25TopK(corpus, dup, k = 10).orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(dupGot.sameElements(got))
  }

  test("stratifiedCap respects the cap even when salts exceed group size") {
    val out = Curation.stratifiedCap(docs, "lang", "doc_id", cap = 7, salts = 64)
    val sizes = out.groupBy("lang").count().collect().map(_.getLong(1))
    assert(sizes.nonEmpty && sizes.forall(_ <= 7))
  }

  test("diverse sample: per-cluster caps hold, every cluster with members is covered, deterministic") {
    val emb = GraftSession.table(spark, sfDir, "embeddings")
    val assigned = graft.similarity.Ann.portableAssignments(emb, nCentroids = 8)
    val clusterSizes = assigned.groupBy("cl").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = Curation.diverseSample(emb, nClusters = 8, cap = 12)
      .select("vec_id", "cl", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.nonEmpty)
    // per-cluster quota: exactly min(cap, cluster size) picks, ranks 1..n
    got.groupBy(_._2).foreach { case (cl, picks) =>
      assert(picks.length == math.min(12L, clusterSizes(cl)),
        s"cluster $cl: ${picks.length} picks for size ${clusterSizes(cl)}")
      assert(picks.map(_._3).sorted.toSeq == (1 to picks.length))
    }
    // the sample spans the space: every non-empty cluster contributes
    assert(got.map(_._2).distinct.length == clusterSizes.count(_._2 > 0),
      "a non-empty cluster was left out of the sample")
    // pure function of the data
    val again = Curation.diverseSample(emb, nClusters = 8, cap = 12)
      .select("vec_id", "cl", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
  }

  test("weighted sample: salted phases equal the single-window reference; heavy weights dominate") {
    import org.apache.spark.sql.expressions.Window
    val df = docs.select(col("doc_id"), col("lang"),
      greatest(col("n_chars"), lit(1)).cast("double").as("w"))
    val got = operators.Curation.weightedSample(df, "lang", "doc_id", col("w"), k = 5)
      .select("lang", "doc_id", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // reference: one global window per group, same A-ES key
    val v = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("double")
    val key = round(log((v + 0.5) / 4294967296.0) / col("w"), 9)
    val ref = df.withColumn("__k", key)
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("__k").desc, col("doc_id"))))
      .filter(col("sample_rank") <= 5)
      .select("lang", "doc_id", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == ref)
    // A-ES semantics: an overwhelming weight is always selected
    val heavyId = docs.select(min("doc_id")).collect()(0).getLong(0)
    val heavyLang = docs.filter(col("doc_id") === heavyId).select("lang").collect()(0).getString(0)
    val skewed = df.withColumn("w",
      when(col("doc_id") === heavyId, lit(1e9)).otherwise(lit(1e-3)))
    val top1 = operators.Curation.weightedSample(skewed, "lang", "doc_id", col("w"), k = 1)
      .filter(col("lang") === heavyLang).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(top1 == Seq(heavyId), "the dominant weight must win its group's k=1 sample")
  }

  test("ngram census: positional tf counts repeats, df counts docs once, k caps") {
    import spark.implicits._
    // d1 repeats "a b" twice (positions 1 and 3) → tf 2, df 1 from d1;
    // d2 contributes one more of each; d3 is a single token (no bigram).
    val crafted = Seq(
      (1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = Curation.ngramTopK(crafted, n = 2, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "a b": tf 3 (2 in d1 + 1 in d2), df 2; "b a": tf 1 df 1 (inside d1);
    // "b c": tf 1 df 1. Ties order lexicographically.
    assert(got.toSeq == Seq(("a b", 3L, 2L), ("b a", 1L, 1L), ("b c", 1L, 1L)))
    // k caps the census; order is (tf desc, gram)
    val top1 = Curation.ngramTopK(crafted, n = 2, k = 1).collect()
    assert(top1.length == 1 && top1.head.getString(0) == "a b")
  }

  test("tfidf ranks are dense 1..k per doc and scores non-increasing") {
    val out = Curation.tfidfTopTerms(docs, k = 3).collect()
      .groupBy(_.getLong(0)).values
    out.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("classifierScore matches a direct reference computation; <2-token docs score 0") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Curation.classifierScore(corpus).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // the exact contract, recomputed independently: w[b] =
    // first-8-hex(md5("wt|b")) % 2001 - 1000, b = first-8-hex(md5("w|gram")) % 4096
    def h8(sIn: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sIn.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def weight(g: String): Long = h8("wt|" + (h8("w|" + g) % 4096)) % 2001 - 1000
    val raw1 = weight("alpha beta") + weight("beta gamma")
    // exact IEEE division — the operator deliberately does NOT round
    // (representation ties at 6dp round differently across engines)
    val exp1 = raw1 / 2000.0
    assert(got(0) == ((1L, 2L, exp1, exp1 > 0)))
    assert(got(1) == ((2L, 0L, 0.0, false)))
    assert(got(2) == ((3L, 0L, 0.0, false)))
  }

  test("importanceResample ranks target-vocabulary docs first; ties by doc_id; partition-stable") {
    import spark.implicits._
    // the target slice speaks {aa bb}; source-only docs speak {zz yy};
    // doc 5 carries the source label but half-target vocabulary
    val corpus = Seq(
      (1L, "aa bb aa bb", "en"),
      (2L, "bb aa bb aa", "en"),
      (3L, "zz yy zz yy", "xx"),
      (4L, "yy zz yy zz", "xx"),
      (5L, "aa bb zz yy", "xx")).toDF("doc_id", "text", "lang")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.importanceResample(df, col("lang") === "en", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val res = run(corpus)
    assert(res.map(_._1) == Seq(1L, 2L, 5L, 3L, 4L),
      s"importance order wrong: $res")
    // docs 1/2 are the same bag of words → identical weight, doc_id tiebreak
    assert(res(0)._3 == res(1)._3)
    // the mixed doc outranks pure-source docs but not pure-target ones
    assert(res(1)._3 > res(2)._3 && res(2)._3 > res(3)._3)
    assert(res(3)._3 == res(4)._3)
    // bit-identical under a different input partitioning
    assert(run(corpus.repartition(7)) == res)
    Graft.clearOperatorCaches()
  }

  test("L38 chunking: window/stride fan-out, overlap content, short-doc identity") {
    import spark.implicits._
    val words = (1 to 130).map(i => s"w$i")
    val docs = Seq(
      (1L, words.mkString(" ")),            // 130 words → chunks at 0/48/96
      (2L, "a b c"),                        // shorter than the window → 1 chunk
      (3L, (1 to 64).map(i => s"x$i").mkString(" "))) // exactly one window
      .toDF("doc_id", "text")
    val out = Curation.chunkDocuments(docs, window = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).length == 3)
    // chunk k starts at word k*stride+1 and the overlap region is shared
    assert(byDoc(1L)(0)._3.startsWith("w1 ") && byDoc(1L)(1)._3.startsWith("w49 "))
    assert(byDoc(1L)(0)._3.split(" ").takeRight(16).toSeq ==
      byDoc(1L)(1)._3.split(" ").take(16).toSeq) // 64-48 = 16 shared words
    assert(byDoc(1L)(2)._4 == 130 - 96)           // short tail chunk, never empty
    assert(byDoc(2L).toSeq == Seq((2L, 0, "a b c", 3)))
    assert(byDoc(3L).length == 1 && byDoc(3L)(0)._4 == 64)
    // every token of every doc appears in at least one of its chunks
    assert(byDoc(1L).flatMap(_._3.split(" ")).toSet == words.toSet)
  }

  test("L38 chunking matches a reference model over random docs and knob settings") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0 until 80).map { i =>
      val n = rnd.nextInt(200) + 1
      (i.toLong, Seq.fill(n)("t" + rnd.nextInt(50)).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text").repartition(7)
    for ((w, s) <- Seq((64, 48), (16, 16), (10, 3))) {
      val got = Curation.chunkDocuments(df, w, s).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .sortBy(x => (x._1, x._2)).toSeq
      val want = docs.flatMap { case (id, text) =>
        val toks = text.split(" ")
        val nc = if (toks.length <= w) 1
          else 1 + math.ceil((toks.length - w).toDouble / s).toInt
        (0 until nc).map { i =>
          val chunk = toks.slice(i * s, i * s + w)
          (id, i, chunk.mkString(" "), chunk.length)
        }
      }.sortBy(x => (x._1, x._2))
      assert(got == want, s"window=$w stride=$s diverged from the model")
    }
  }

  test("shardAssignments is deterministic, even, and additive under corpus growth") {
    val a1 = Curation.shardAssignments(docs, 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    val a2 = Curation.shardAssignments(docs.repartition(7), 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(a1 == a2, "assignment must be partition-invariant")
    // even: every shard populated, no shard over 2× the uniform share
    val sizes = a1.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.size == 8 && sizes.values.max <= 2 * a1.size / 8)
    // pos is a dense 0..n-1 rank within each shard
    for ((_, rows) <- a1.groupBy(_._2))
      assert(rows.map(_._3).sorted == (0 until rows.size))
    // additive: dropping half the corpus never moves a survivor's shard
    val half = Curation.shardAssignments(docs.filter(col("doc_id") % 2 === 0), 8)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = a1.map(x => (x._1, x._2)).toMap
    assert(half.forall { case (id, s) => full(id) == s })
  }

  test("count-min sketch: one-sided error on EVERY term, bounded size, shard-mergeable") {
    import spark.implicits._
    val sk = Curation.countMinSketch(docs, d = 4, w = 256).cache()
    assert(sk.count() <= 4L * 256, "sketch exceeded its d×w bound")
    val exact = docs
      .select(explode(graft.functions.Text.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("exact_n"))
    val est = Curation.cmsEstimate(sk, exact.select(col("t").as("term")), d = 4, w = 256)
    val joined = est.join(exact.withColumnRenamed("t", "term"), "term")
      .select("term", "cms_est", "exact_n")
      .as[(String, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (t, e, x) =>
      assert(e >= x, s"CMS underestimated '$t': $e < $x")
    }
    // absent term → exact 0
    val miss = Curation.cmsEstimate(sk,
      Seq("__definitely_not_a_token__").toDF("term"), d = 4, w = 256)
      .as[(String, Long)].collect()
    // (may collide to a positive estimate, but must never be negative;
    // with w=256 on this corpus the min bucket is usually small)
    assert(miss.head._2 >= 0)
    // mergeability: sketch(A)+sketch(B) == sketch(A∪B), counter by counter
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val summed = Curation.countMinSketch(a, d = 4, w = 256)
      .unionByName(Curation.countMinSketch(b, d = 4, w = 256))
      .groupBy("r", "b").agg(sum("n").as("n"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = sk.as[(Int, Long, Long)].collect().toSet
    assert(summed == whole, "shard sketches must sum to the corpus sketch")
  }

  test("bigram LM is sequence-aware where the unigram is bag-of-words") {
    import spark.implicits._
    // same token BAG, different order: d1 alternates (high bigram
    // probability), d2 is sorted (rare transitions)
    val crafted = Seq((1L, "a b a b a b"), (2L, "a a a b b b")).toDF("doc_id", "text")
    val uni = Curation.unigramLogprob(crafted).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(1L) == uni(2L), "unigram must not see order")
    val bi = Curation.bigramLogprob(crafted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(bi.forall(_._2 == 5), "6 tokens → 5 bigram positions")
    val m = bi.map(x => x._1 -> x._3).toMap
    // hand-computed add-1 model: c(ab)=4,c(ba)=2,c(aa)=2,c(bb)=2,
    // c(a·)=6, c(b·)=4, V=2
    def lp6(num: Double, den: Double) =
      BigDecimal(math.log(num / den)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def avg6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(1L) == avg6((3 * lp6(5, 8) + 2 * lp6(3, 6)) / 5))
    assert(m(2L) == avg6((2 * lp6(3, 8) + lp6(5, 8) + 2 * lp6(3, 6)) / 5))
    assert(m(1L) > m(2L), "alternating text must outscore sorted text")
  }

  test("BPE trainer: classic merge sequence on the textbook example; apply segments correctly") {
    import spark.implicits._
    // vocab: low×2, lower×1 → pairs (l,o)=3 (o,w)=3 tie → 'l'<'o' picks
    // (l,o); then (lo,w)=3; then (low,e)=1 (e,r)=1 tie → (e,r); (low,er)
    val crafted = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val merges = Curation.trainBpeMerges(crafted, k = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges == Seq((1, "l", "o", 3L), (2, "lo", "w", 3L),
      (3, "e", "r", 1L), (4, "low", "er", 1L)),
      s"merge table diverged: $merges")
    // apply: "low" → [low]; "lower" → [low, er] → merge 4 → [lower]
    val applied = Curation.applyBpe(crafted, merges.map(m => (m._2, m._3)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(applied.toSeq == Seq((1L, 3L, 3L))) // every word one token
    // a truncated merge table leaves "lower" split: [low, er]
    val partial = Curation.applyBpe(crafted, merges.take(3).map(m => (m._2, m._3)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(partial.toSeq == Seq((1L, 3L, 4L)))
  }

  test("BPE trainer equals an in-memory classic BPE on the real corpus") {
    val got = Curation.trainBpeMerges(docs, k = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // in-memory twin: word counts → iterative argmax merge
    var vocab: Map[Vector[String], Long] = docs
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")).collect()
      .map(r => cpSplit(r.getString(0)) -> r.getLong(1)).toMap
    val want = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (r <- 1 to 8) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        pairs((syms(i), syms(i + 1))) = pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairs.nonEmpty) {
        val ((a, b), n) = pairs.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        want += ((r, a, b, n))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          for (s <- syms)
            if (out.nonEmpty && out.last == a && s == b) out(out.length - 1) = a + b
            else out += s
          out.toVector
        } { case (_, c) => c }(_ + _)
      }
    }
    assert(got == want.toSeq, s"distributed trainer diverged from the classic algorithm")
  }

  test("L53/L54: id encoding and packed training sequences equal the classic in-memory pipeline") {
    val merges = Curation.trainBpeMerges(docs, k = 8).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = Curation.bpeVocabulary(docs, merges)
    val idOf = vocab.zipWithIndex.toMap
    // in-memory twin encoder (the classic single-pass merge semantics)
    def segment(word: String): Vector[String] =
      merges.foldLeft(cpSplit(word)) { case (syms, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        for (s <- syms)
          if (out.nonEmpty && out.last == a && s == b) out(out.length - 1) = a + b
          else out += s
        out.toVector
      }
    def encode(text: String): Vector[Int] =
      text.split(" ").toVector.flatMap(segment).map(s => idOf.getOrElse(s, -1))
    val corpus = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = Curation.encodeBpe(docs, merges, vocab).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1).toVector, r.getLong(2)))).toMap
    corpus.foreach { case (id, text) =>
      val exp = encode(text)
      assert(got(id) == ((exp, exp.length.toLong)), s"doc $id encoding diverged")
    }
    // the native BpeEncode expression is bit-identical to the composed
    // nested-HOF encode it replaced on the hot path (incl. a crafted
    // empty-word edge: double space → "" word → one −1 id in both)
    import spark.implicits._
    val edge = Seq(
      (9000001L, "join  hash"), (9000002L, ""),
      // non-BMP: emoji (U+1F600) and CJK ext-B (U+2A6A5) are single
      // symbols (one −1 each, unknown to the corpus vocab) — a UTF-16
      // charAt split would shred each into TWO lone surrogates
      (9000003L, "jo😀in 𪚥𪚥")).toDF("doc_id", "text")
    val withEdge = docs.select("doc_id", "text").unionByName(edge)
    val comp = Curation.encodeBpeComposed(withEdge, merges, vocab).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1).toVector, r.getLong(2)))).toMap
    val nat = Curation.encodeBpe(withEdge, merges, vocab).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1).toVector, r.getLong(2)))).toMap
    assert(nat == comp, "native BpeEncode diverged from the composed HOF encode")
    assert(nat(9000001L)._1.contains(-1), "empty word must encode as -1 in both forms")
    assert(nat(9000003L)._1.count(_ == -1) == 3,
      "each supplementary code point must be ONE unknown symbol (one -1), not two surrogates")
    // packed sequences: shard-local concatenation in (md5, id) order,
    // split at seqLen, last chunk padded with -1
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seqLen = 64
    val want = corpus
      .map { case (id, text) => (hex(id.toString), id, encode(text)) }
      .groupBy { case (h, _, _) => java.lang.Long.parseLong(h.take(8), 16) % 4 }
      .flatMap { case (shard, ds) =>
        val ids = ds.sortBy { case (h, id, _) => (h, id) }.flatMap(_._3).toVector
        ids.grouped(seqLen).zipWithIndex.map { case (chunk, i) =>
          (shard, i.toLong, chunk.length.toLong,
            chunk.padTo(seqLen, -1).toVector)
        }
      }.toSet
    val seqs = Curation.trainingSequences(docs, merges, vocab, seqLen, shards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getSeq[Int](3).toVector))
    assert(seqs.toSet == want)
    // every non-final sequence per shard is exactly full
    seqs.groupBy(_._1).values.foreach { ss =>
      ss.sortBy(_._2).dropRight(1).foreach { s =>
        assert(s._3 == seqLen, s"non-final sequence ${s._2} not full: ${s._3}")
      }
    }
    // the driver-facing scalar digests (L54's gate row — pandas cannot
    // sort array cells, VERDICT r7 #1) are exactly the array's sum /
    // head / last-REAL-token projections
    val sums = Curation.trainingSequenceChecksums(docs, merges, vocab, seqLen, shards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5)))
    val wantSums = seqs.map { case (sh, sq, nt, idsArr) =>
      val real = idsArr.take(nt.toInt)
      (sh, sq, nt, real.map(_.toLong).sum, real.head, real.last)
    }
    assert(sums.toSet == wantSums.toSet)
    Graft.clearOperatorCaches()
  }

  test("L56 fertility: ratios equal the collected per-doc counts; crafted merges compress the merged language most") {
    import spark.implicits._
    val merges = Curation.trainBpeMerges(docs, k = 8).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Curation.fertilityReport(docs, merges).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got.nonEmpty)
    // independent recompute from the collected per-doc counts
    val perDoc = Curation.applyBpe(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).map(t => t._1 -> (t._2, t._3)).toMap
    val meta = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).replace(" ", "").length.toLong))
    meta.groupBy(_._2).foreach { case (lang, docsOf) =>
      val row = got.find(_._1 == lang).get
      val (w, b) = (docsOf.map(d => perDoc(d._1)._1).sum, docsOf.map(d => perDoc(d._1)._2).sum)
      val c = docsOf.map(_._3).sum
      assert(row._2 == docsOf.length && row._3 == w && row._4 == b && row._5 == c)
      assert(row._6 == ((2L * 1000000 * b + w) / (2 * w)).toDouble / 1000000.0)
      assert(row._7 == ((2L * 1000000 * b + c) / (2 * c)).toDouble / 1000000.0)
    }
    // direction: a vocabulary merged FOR one language compresses it
    // below character-splitting (tokens_per_char < 1 would need merges
    // to fire) — with 8 merges trained on the real corpus, every
    // language should sit strictly below the no-merge ceiling of 1.0
    assert(got.forall(_._7 < 1.0), s"no merge fired anywhere: $got")
    // the zero-shuffle native count path equals the composed
    // explode→segment→regroup form it replaced — including the row
    // SET on a corpus with a null-text doc, which both forms drop
    // (composed: explode skips null arrays; native: explicit filter —
    // ADVICE r8)
    import spark.implicits._
    val withNull = docs.select("doc_id", "text")
      .unionByName(Seq((9000011L, Option.empty[String])).toDF("doc_id", "text"))
    val comp = Curation.applyBpeComposed(withNull, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val nat = Curation.applyBpe(withNull, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(nat == comp, "native applyBpe counts diverged from the composed form")
    assert(!nat.exists(_._1 == 9000011L), "null-text docs must be dropped by both forms")
  }

  test("L73 mix plan: over-represented sources downsample to the uniform target, small ones keep all") {
    import spark.implicits._
    // tokens: big=60 (3 docs), mid=30 (2 docs), tiny=10 (1 doc) → total
    // 100, G=3, target 33; rates: big 550000, mid 1e6 (capped), tiny 1e6
    val docs = Seq(
      ("big", "a b c d e f g h i j a b c d e f g h i j"),
      ("big", "a b c d e f g h i j a b c d e f g h i j"),
      ("big", "a b c d e f g h i j a b c d e f g h i j"),
      ("mid", "a b c d e f g h i j a b c d e"),
      ("mid", "a b c d e f g h i j a b c d e"),
      ("tiny", "a b c d e f g h i j"))
      .toDF("source", "text")
    val got = operators.Curation.mixPlan(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("big", 3L, 60L, 33L, 550000L, 33L),
      ("mid", 2L, 30L, 33L, 1000000L, 30L),
      ("tiny", 1L, 10L, 33L, 1000000L, 10L)))
    // expected tokens never exceed the inventory, rates never exceed 1
    got.foreach { case (_, _, n, _, r, e) =>
      assert(r <= 1000000L && e <= n)
    }
  }

  test("L58 budget select: equals the naive greedy prefix, tight to the budget, partition-invariant") {
    import graft.functions.Text
    val budget = 8000L
    val got = Curation.budgetSelect(docs, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    // the naive in-memory greedy prefix over the same exact-integer score
    val en = Text.Stopwords.toMap.apply("en").toSet
    val scored = docs.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).split(" ")
      val n = toks.length.toLong
      val stop = toks.count(en).toLong
      (r.getLong(0), n, (2L * 1000000 * stop + n) / (2 * n))
    }
    val order = scored.sortBy { case (id, _, s) => (-s, id) }
    var cum = 0L
    val want = order.filter { case (_, n, _) => cum += n; cum <= budget }
    assert(got.toSet == want.map(t => (t._1, t._2, t._3)).toSet,
      "banded selection diverged from the naive global prefix")
    // tight: within budget, and the NEXT document in order cannot fit
    val total = got.map(_._2).sum
    assert(total <= budget)
    val keptIds = got.map(_._1).toSet
    order.find(d => !keptIds.contains(d._1)).foreach { next =>
      assert(total + next._2 > budget, "prefix stopped early — next doc still fits")
    }
    // partition invariance (the band rollup + crossing-band window must
    // not depend on physical layout)
    val re = Curation.budgetSelect(docs.repartition(7), budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(re == got)
  }

  test("L59 per-group budget select: each group's own naive prefix; group cap is the named error") {
    import graft.functions.Text
    val budget = 800L // below every source's total — each group must CUT
    val got = Curation.budgetSelectPerGroup(docs, "source", budget).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    val en = Text.Stopwords.toMap.apply("en").toSet
    val scored = docs.select("source", "doc_id", "text").collect().map { r =>
      val toks = r.getString(2).split(" ")
      val n = toks.length.toLong
      val stop = toks.count(en).toLong
      (r.getString(0), r.getLong(1), n, (2L * 1000000 * stop + n) / (2 * n))
    }
    val want = scored.groupBy(_._1).toSeq.flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy { case (_, id, _, s) => (-s, id) }
        .filter { case (_, _, n, _) => cum += n; cum <= budget }.toSeq
    }.toSet
    assert(got.toSet == want, "per-group selection diverged from the per-group naive prefix")
    // every group independently within budget
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._3).sum <= budget, s"$src over budget")
    }
    assert(got.map(_._1).distinct.size > 1, "selection must span several groups")
    // the maxGroups cap is the named TooManyPartitions error
    intercept[graft.errors.TooManyPartitions] {
      Curation.budgetSelectPerGroup(docs, "source", budget, maxGroups = 1).collect()
    }
    // NULL groups are their own budget line under the reserved key —
    // not silently dropped
    val withNull = docs.limit(5).withColumn("source",
      when(col("doc_id") % 2 === 0, col("source")))
    val nulled = Curation.budgetSelectPerGroup(withNull, "source", budget).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(nulled.exists(_._1 == "__NULL_GROUP__"),
      "null-group documents must select under the reserved group")
    // L59b mixture spec: per-group budgets from the spec table, groups
    // OMITTED from the spec contribute nothing (budget 0 by omission)
    val spec = Map("src0" -> 500L, "src1" -> 120L)
    val mixed = Curation.budgetSelectMixture(docs, "source", spec).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(mixed.map(_._1).toSet == Set("src0", "src1"),
      "only spec'd groups may contribute to the mixture")
    mixed.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._3).sum <= spec(src), s"$src over its spec budget")
    }
    // each spec'd group equals its own naive prefix under ITS budget
    val wantMix = scored.filter(d => spec.contains(d._1)).groupBy(_._1).toSeq
      .flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy { case (_, id, _, s) => (-s, id) }
          .filter { case (_, _, n, _) => cum += n; cum <= spec(src) }.toSeq
      }.toSet
    assert(mixed.toSet == wantMix)
  }

  test("source rollup: flag matches its definition and splits the corpus both ways") {
    val out = Curation.sourceQuality(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.nonEmpty)
    out.foreach { case (src, _, stop, dup, blocked) =>
      val expect = math.round(stop * 1000000) < 55000 || math.round(dup * 1000000) > 50000
      assert(blocked == expect, s"$src flag diverged from its definition")
    }
    assert(out.exists(_._5) && out.exists(!_._5),
      "thresholds must split the corpus (vacuous flag otherwise)")
  }

  test("writeShards lays out one dir per shard matching the assignment") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_shards_${System.nanoTime()}"
    Curation.writeShards(docs, path, nShards = 4)
    val back = spark.read.parquet(path)
    // partition column survives; contents = corpus exactly once
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    val want = Curation.shardAssignments(docs, 4)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = back.select(col("doc_id"), col("shard").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("L52 calibration: conserves totals, share is definitional, the model ranks the classes") {
    import spark.implicits._
    val weights = Curation.trainClassifier(docs, col("lang") === "en",
        nBuckets = 64, iters = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val wVec = (0 to 64).map(b => weights.getOrElse(b, 0L))
    val cal = Curation.scoreCalibration(docs, col("lang") === "en", wVec)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // conservation: every document lands in exactly one bucket
    assert(cal.map(_._2).sum == docs.count())
    assert(cal.map(_._3).sum == docs.filter(col("lang") === "en").count())
    // the share column is the definitional half-up micros ratio
    cal.foreach { case (_, n, p, share) =>
      val exp = ((2L * 1000000 * p + n) / (2 * n)).toDouble / 1000000.0
      assert(share == exp)
    }
    // ranking direction on a cleanly separable crafted corpus (the real
    // synthetic corpus shares its tiny vocabulary across languages and
    // confounds score with length — a modeling artifact, not a trainer
    // property): positive docs use one gram vocabulary, negatives
    // another, so the trained model must score positives higher
    val crafted = ((1 to 20).map(i => (i.toLong, "alpha beta alpha beta", "en")) ++
      (21 to 40).map(i => (i.toLong, "gamma delta gamma delta", "de")))
      .toDF("doc_id", "text", "lang")
    val cw = Curation.trainClassifier(crafted, col("lang") === "en",
        nBuckets = 64, iters = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val cVec = (0 to 64).map(b => cw.getOrElse(b, 0L))
    val ccal = Curation.scoreCalibration(crafted, col("lang") === "en", cVec)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // every positive doc sits in a strictly higher score bucket
    val maxNegBucket = ccal.filter(c => c._3 < c._2).map(_._1).max
    val minPosBucket = ccal.filter(_._3 > 0).map(_._1).min
    assert(minPosBucket > maxNegBucket,
      s"crafted positives not separated: pos from $minPosBucket, neg up to $maxNegBucket")
    Graft.clearOperatorCaches()
  }

  test("L51 vocab coverage: deterministic top-V cut with term tie-break, exact OOV shares") {
    import spark.implicits._
    // counts: a=3, b=2, c=1, d=1
    val d = Seq((1L, "a a b c", "en"), (2L, "a b d", "de"))
      .toDF("doc_id", "text", "lang")
    def shares(v: Int) = Curation.vocabCoverage(d, vocabSize = v).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // V=2 → {a,b}: en misses c (1/4), de misses d (1/3, half-up micros)
    assert(shares(2) == Map(
      "de" -> ((1L, 3L, 1L, 0.333333)), "en" -> ((1L, 4L, 1L, 0.25))))
    // V=3: c and d tie on count — the term tie-break keeps 'c'
    assert(shares(3) == Map(
      "de" -> ((1L, 3L, 1L, 0.333333)), "en" -> ((1L, 4L, 0L, 0.0))))
    Graft.clearOperatorCaches()
  }

  test("L50 classifier training: descends the loss, learns the label mean on a bias-only corpus, partition-invariant") {
    import spark.implicits._
    // bias-only corpus (no bigrams): with w0=0, trace = N, iteration 1's
    // bias weight is EXACTLY the half-away-rounded mean label in micros
    val biasOnly = Seq(
      (1L, "word", "en"), (2L, "word", "en"), (3L, "word", "de"),
      (4L, "word", "en"), (5L, "word", "fr"))
      .toDF("doc_id", "text", "lang")
    val w1 = Curation.trainClassifier(biasOnly, col("lang") === "en",
      nBuckets = 4, iters = 1).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    // mean label = 3/5 → 600000 micros
    assert(w1 == Map(4 -> 600000L))
    // real corpus: squared loss at the trained weights is below the
    // all-zeros loss (descent actually happened), recomputed from an
    // independent scoring of the same feature definition
    def loss(weights: Map[Int, Long]): Double = {
      val toks = split(col("text"), " ")
      val grams = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>"))
      val wLit = typedLit((0 to 64).map(b => weights.getOrElse(b, 0L)))
      val bucket = (g: org.apache.spark.sql.Column) =>
        (conv(substring(md5(concat(lit("w|"), g)), 1, 8), 16, 10).cast("long") % 64).cast("int")
      docs.select(
          (aggregate(grams, lit(0L), (acc, g) => acc + get(wLit, bucket(g)))
            + get(wLit, lit(64))).as("__p"),
          when(col("lang") === "en", lit(1000000L)).otherwise(lit(0L)).as("__t"))
        .select(pow(col("__p") - col("__t"), 2).as("__l"))
        .agg(sum(col("__l"))).head.getDouble(0)
    }
    val trained = Curation.trainClassifier(docs, col("lang") === "en",
      nBuckets = 64, iters = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(loss(trained) < loss(Map.empty),
      s"training did not descend: ${loss(trained)} !< ${loss(Map.empty)}")
    // partition invariance: exact integer gradients → identical model
    val re = Curation.trainClassifier(docs.repartition(7), col("lang") === "en",
      nBuckets = 64, iters = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(re == trained)
    Graft.clearOperatorCaches()
  }

  test("L64 decode: round trip holds corpus-wide incl. double spaces; a gutted vocab is caught") {
    import spark.implicits._
    val merges = Curation.trainBpeMerges(docs, k = 8).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = Curation.bpeVocabulary(docs, merges)
    val edge = docs.select("doc_id", "text")
      .unionByName(Seq((9000021L, "join  hash")).toDF("doc_id", "text"))
    val got = Curation.decodeBpe(edge, merges, vocab).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got.nonEmpty && got.forall(_._3),
      s"round trip failed for ${got.filterNot(_._3).take(3).mkString(", ")}")
    // the double-space doc: the empty word encodes -1, decodes to "",
    // and the space-stripped target drops it too
    assert(got.find(_._1 == 9000021L).get._2 == "joinhash")
    // negative control: drop the vocabulary's first base character —
    // every document containing it must now fail the round trip (the
    // flag can actually fire)
    val gutted = Curation.decodeBpe(edge, merges, vocab.drop(1)).collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    assert(gutted.exists(!_._2), "gutted vocab went undetected")
  }

  test("L69 no-split packing equals the in-memory greedy fold; docs stay whole; cell cap fires") {
    import org.apache.spark.sql.functions.size
    val seqLen = 48
    val got = Curation.packNoSplit(docs, "lang", "doc_id",
        size(graft.functions.Text.tokens(col("text"))), seqLen, shards = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(got.nonEmpty)
    // in-memory greedy twin over the same (md5, id) cell order
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = docs.select("lang", "doc_id", "text").collect().map { r =>
      val h = hex(r.getLong(1).toString)
      (r.getString(0), java.lang.Long.parseLong(h.take(8), 16) % 8, h,
        r.getLong(1), r.getString(2).split(" ", -1).length.toLong)
    }
    val want = rows.groupBy(t => (t._1, t._2)).toSeq.flatMap { case ((lang, sh), ds) =>
      var bin = 0L; var end = 0L
      ds.sortBy(t => (t._3, t._4)).map { case (_, _, _, id, n) =>
        val fits = end == 0L || end + n <= seqLen
        if (!fits) { bin += 1; end = 0L }
        val off = end
        end = off + n
        (lang, sh, id, n, bin, off, n > seqLen)
      }
    }.toSet
    assert(got.toSet == want)
    // documents never split: every doc appears exactly once
    assert(got.map(_._3).distinct.length == got.length)
    // bins never exceed seqLen unless they hold a single overflow doc
    got.groupBy(t => (t._1, t._2, t._5)).values.foreach { bs =>
      if (!bs.exists(_._7)) assert(bs.map(_._4).sum <= seqLen)
      else assert(bs.length == 1, s"overflow doc shares a bin: $bs")
    }
    // both paths exercised on this corpus
    assert(got.exists(_._7) && got.groupBy(t => (t._1, t._2, t._5)).values.exists(_.length > 1))
    // partition invariance
    val re = Curation.packNoSplit(docs.repartition(7), "lang", "doc_id",
        size(graft.functions.Text.tokens(col("text"))), seqLen, shards = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    assert(re == want)
    // the cell bound is a named in-plan failure, not silent truncation
    val e = intercept[Exception] {
      Curation.packNoSplit(docs, "lang", "doc_id",
        size(graft.functions.Text.tokens(col("text"))), seqLen,
        shards = 1, maxCellRows = 10).collect()
    }
    assert(e.getMessage.contains("maxCellRows") ||
      Option(e.getCause).exists(_.getMessage.contains("maxCellRows")), e.getMessage)
  }

  test("L62 lexical diversity equals an in-memory recompute per source") {
    val got = Curation.lexicalDiversity(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    assert(got.nonEmpty)
    val rows = docs.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.map(_._1) == rows.map(_._1).distinct.sorted.toSeq)
    rows.groupBy(_._1).foreach { case (src, ds) =>
      // Spark split(text, ' ') keeps trailing empties (limit −1)
      val toks = ds.flatMap(_._2.split(" ", -1))
      val tf = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.length.toLong
      val types = tf.size.toLong
      val hapax = tf.values.count(_ == 1L).toLong
      val top = tf.values.max
      val row = got.find(_._1 == src).get
      assert(row == ((src, ds.length.toLong, n, types, hapax, top,
        types * 1000000L / n, hapax * 1000000L / n, top * 1000000L / n)),
        s"source $src diverged")
    }
  }

  test("L72 curriculum phases equal the naive global-rank twin; crossing bands exercised") {
    import SparkTestSession.spark.implicits._
    // scores engineered so one band holds a phase boundary: 12 docs,
    // 3 phases → boundary at positions 4 and 8; several docs share a
    // band (equal scores) so the crossing window genuinely ranks
    val texts = Seq(
      "the the the the",        // stop 4/4 → 1.0
      "the the the a",          // 1.0
      "the the a b",            // 0.5... varied
      "the a b c", "a b c d", "the the b b",
      "x y z w", "the x y z", "a a the the",
      "p q r s", "the p q r", "t u v w")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = operators.Curation.curriculumPhases(docs, nPhases = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSeq
    // naive twin: global sort by (score desc, doc_id), phase = pos*3/n
    val scored = got.map { case (id, sc, _) => (id, sc) }
    val order = scored.sortBy { case (id, sc) => (-sc, id) }
    val n = order.length
    val want = order.zipWithIndex
      .map { case ((id, _), pos) => id -> (pos * 3 / n) }.toMap
    got.foreach { case (id, _, ph) =>
      assert(ph == want(id), s"doc $id phase $ph != naive ${want(id)}") }
    // all three phases populated, and at least one band spans a boundary
    assert(got.map(_._3).distinct.sorted == Seq(0, 1, 2))
    // nPhases=1 → everything phase 0
    assert(operators.Curation.curriculumPhases(docs, nPhases = 1)
      .collect().forall(_.getInt(3) == 0))
    // empty corpus: same 4-column schema as the populated path (the
    // internal __band column must not leak out)
    val empty = operators.Curation.curriculumPhases(
      docs.filter(org.apache.spark.sql.functions.lit(false)), nPhases = 3)
    assert(empty.columns.toSeq == Seq("doc_id", "n_tokens", "score_micros", "phase"))
    assert(empty.count() == 0)
  }

  test("L76 curation verdicts: every reason code reachable, precedence fixed, partition-invariant") {
    import spark.implicits._
    val dup = "the quick brown fox jumps over that lazy dog and cat runs"
    val crafted = Seq(
      (1L, null.asInstanceOf[String], "en", "s1"), // empty: null text
      (2L, "a b c", "en", "s1"),                   // empty: under 10 tokens
      // 12 tokens, six EN stopwords, tagged de → lang_mismatch
      (3L, "the cat of dog and fish to bird that cow is horse", "de", "s1"),
      // 10 one-char tokens: avg_word_len 1 < 2 fails quality BEFORE the
      // 0.9 dup-word fraction can label it repetitive (precedence)
      (4L, "a a a a a a a a a a", "en", "s2"),
      // 10 tokens, avg len 2.8 (quality passes), dup_word_frac 0.5 → repetitive
      (5L, "the cat sat on the mat the cat sat on", "en", "s2"),
      (6L, dup, "en", "s3"),                       // keep: md5 winner (min id)
      (7L, dup, "en", "s3")                        // duplicate: md5 loser
    ).toDF("doc_id", "text", "lang", "source")
    def got(df: org.apache.spark.sql.DataFrame) =
      Curation.curationVerdicts(df).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val want = Seq(
      (1L, "s1", "empty"), (2L, "s1", "empty"), (3L, "s1", "lang_mismatch"),
      (4L, "s2", "low_quality"), (5L, "s2", "repetitive"),
      (6L, "s3", "keep"), (7L, "s3", "duplicate"))
    assert(got(crafted) == want)
    // the winner rule is a keyed aggregate — scan order cannot matter
    assert(got(crafted.repartition(5)) == want)

    // L77 data card: the rollup reconciles with the per-doc verdicts
    // exactly (shared verdictFrame — it CANNOT drift, this pins it)
    val card = Curation.dataCard(crafted).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9))).toSeq
    // (source, n_docs, keep, empty, lang, quality, rep, dup, total, kept)
    assert(card == Seq(
      ("s1", 3L, 0L, 2L, 1L, 0L, 0L, 0L, 15L, 0L),  // null=0 + 3 + 12 tok
      ("s2", 2L, 0L, 0L, 0L, 1L, 1L, 0L, 20L, 0L),
      ("s3", 2L, 1L, 0L, 0L, 0L, 0L, 1L, 24L, 12L)))
    // every row's codes partition its documents; kept ≤ total
    card.foreach { case (_, n, k, e, l, q, rp, d, tot, kept) =>
      assert(k + e + l + q + rp + d == n)
      assert(kept <= tot)
    }
  }

  test("L80 NFC: decomposed composes, composed is zero-copy identity, supplementary-plane safe, NULL passes") {
    import spark.implicits._
    val decomposed = "café"
    val composed = "café"
    val emoji = "a 😀 b"
    val df = Seq((1L, decomposed), (2L, composed), (3L, emoji),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Curation.nfcNormalizeDocs(df).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toSeq
    assert(got == Seq(
      (1L, Some(composed), Some(true)),
      (2L, Some(composed), Some(false)),
      (3L, Some(emoji), Some(false)),
      (4L, None, None)))
    // the fast path returns the INPUT buffer — zero allocation on
    // already-normalized text (nearly every real document)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(composed)
    assert(graft.plans.NfcNormalize.normalize(u) eq u)
    assert(graft.plans.NfcNormalize.normalize(
      org.apache.spark.unsafe.types.UTF8String.fromString(decomposed))
      .toString == composed)
  }

  test("L75 corpus drift: per-source deltas fold exactly from a crafted change feed") {
    import spark.implicits._
    // source A: one insert (3 tok), one delete (2 tok); source B: one
    // update 5 → 1 tokens (pre+post rows), one NULL-text insert (0 tok)
    val feed = Seq(
      (10L, "a b c", "A", "insert"),
      (11L, "d e", "A", "delete"),
      (20L, "p q r s t", "B", "update_preimage"),
      (20L, "p", "B", "update_postimage"),
      (21L, null.asInstanceOf[String], "B", "insert")
    ).toDF("doc_id", "text", "source", "_change_type")
    def got(df: org.apache.spark.sql.DataFrame) =
      Curation.corpusDrift(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
    val want = Seq(
      ("A", 1L, 1L, 0L, 0L, 1L),   // +3 (insert) − 2 (delete)
      ("B", 1L, 0L, 1L, 1L, -4L))  // +1 − 5 (update) + 0 (null insert)
    assert(got(feed) == want)
    // the fold is a keyed aggregate — scan order cannot matter
    assert(got(feed.repartition(4)) == want)
    // an empty feed (no-op refresh) reports nothing, with the schema intact
    val empty = Curation.corpusDrift(feed.limit(0))
    assert(empty.columns.toSeq ==
      Seq("source", "n_added", "n_removed", "n_changed", "doc_delta", "tok_delta"))
    assert(empty.count() == 0)
  }
}
