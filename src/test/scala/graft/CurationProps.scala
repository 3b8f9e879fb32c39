package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.operators.Curation

/** ScalaCheck properties for the curation operators whose contracts are
  * algebraic (equality with a classic in-memory algorithm, one-sided
  * error, additivity) — random corpora surface tie-break and boundary
  * cases a fixed fixture can't. Sample counts are small: each sample
  * drives real Spark jobs. */
object CurationProps extends Properties("Curation") {
  import SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(3)

  // the alphabet includes a SUPPLEMENTARY code point (😀, U+1F600 — two
  // UTF-16 units): every splitter in the chain (trainer, vocabulary,
  // native encoder, composed encoder, classic twin) must treat it as
  // ONE symbol, never two lone surrogates (ADVICE r8)
  private val wordGen: Gen[String] =
    Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "😀")).map(_.mkString))
  private val docGen: Gen[String] =
    Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
  private val corpusGen: Gen[Seq[(Long, String)]] =
    Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, docGen))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  /** Code-point split — the engine's symbol alphabet (Spark
    * `split(s, "")` iterates code points; Java's `String.split("")`
    * would shred surrogate pairs). Empty → one empty symbol. */
  private def cpSplit(s: String): Vector[String] =
    if (s.isEmpty) Vector("")
    else s.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /** The classic single-machine BPE trainer (argmax by count desc then
    * pair lexicographic; left-to-right non-overlapping merge). */
  private def classicBpe(words: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => cpSplit(w) } { case (_, c) => c }(_ + _)
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (r <- 1 to k) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        pairs((syms(i), syms(i + 1))) = pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairs.nonEmpty) {
        val ((a, b), n) = pairs.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((r, a, b, n))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val m = scala.collection.mutable.ArrayBuffer[String]()
          for (s <- syms)
            if (m.nonEmpty && m.last == a && s == b) m(m.length - 1) = a + b
            else m += s
          m.toVector
        } { case (_, c) => c }(_ + _)
      }
    }
    out.toSeq
  }

  property("distributed BPE equals classic BPE on random corpora") =
    Prop.forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val got = Curation.trainBpeMerges(df, k = 4).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val words = corpus.flatMap(_._2.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      got == classicBpe(words, 4)
    }

  property("native BpeEncode equals the composed HOF encode under random merge tables") =
    Prop.forAll(corpusGen, Gen.choose(0, 4)) { (corpus, k) =>
      val df = corpus.toDF("doc_id", "text")
      // RANDOM-corpus-trained merges (not fixture-trained): the subtle
      // cases are chains like (a,a) then (aa,a) — random 3-letter words
      // hit them; k=0 pins the no-merge character path
      val merges = Curation.trainBpeMerges(df, k).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val vocab = Curation.bpeVocabulary(df, merges)
      val nat = Curation.encodeBpe(df, merges, vocab).collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1).toVector)).toMap
      val comp = Curation.encodeBpeComposed(df, merges, vocab).collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1).toVector)).toMap
      nat == comp
    }

  property("CMS one-sided error holds for every term on random corpora") =
    Prop.forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val exact = corpus.flatMap(_._2.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val sk = Curation.countMinSketch(df, d = 3, w = 16) // tiny w forces collisions
      val est = Curation.cmsEstimate(sk, exact.keys.toSeq.toDF("term"), d = 3, w = 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.forall { case (t, n) => est(t) >= n }
    }

  /** L58's banded global-prefix plan vs the trivially-correct naive
    * model: random stopword mixes produce scores that collide inside
    * and across the 1000-micro bands, and random budgets land on every
    * boundary class (zero, mid-document, exactly-on-a-document,
    * all-fit) — the band-offset arithmetic's edge cases a crafted
    * fixture can't sweep. */
  property("banded budget selection equals the naive global prefix on random corpora") = {
    val en = graft.functions.Text.Stopwords.toMap.apply("en")
    val wordGen = Gen.oneOf(en ++ Seq("alpha", "beta", "gamma", "delta"))
    val docGen = Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val corpusGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, docGen))
    Prop.forAll(corpusGen, Gen.choose(0L, 120L)) { (texts, budget) =>
      import SparkTestSession.spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Curation.budgetSelect(docs, budget).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // naive model: rank by (score desc, doc_id), keep the cumulative
      // prefix that fits
      val ranked = texts.zipWithIndex.map { case (t, i) =>
        val toks = t.split(" ").toSeq
        val n = toks.size.toLong
        val stop = toks.count(en.contains).toLong
        val score = (2L * 1000000L * stop + n) / (2L * n)
        (i.toLong, n, score)
      }.sortBy { case (id, _, s) => (-s, id) }
      // running cumsum in rank order; the first overflow ends the prefix
      // (the operator's window keeps rows whose running total fits, and
      // the total only grows — identical semantics)
      var cum = 0L
      var open = true
      val want = ranked.flatMap { case (id, n, s) =>
        cum += n
        if (open && cum <= budget) Some((id, n, s))
        else { open = false; None }
      }.toSet
      (got == want) :| s"got $got want $want (budget=$budget texts=$texts)"
    }
  }

  property("shard assignment is additive and partition-invariant on random corpora") =
    Prop.forAll(corpusGen, Gen.choose(2, 5)) { (corpus, nShards) =>
      val df = corpus.map { case (id, t) => (id, t, t.length.toLong) }
        .toDF("doc_id", "text", "n_chars")
      val full = Curation.shardAssignments(df, nShards)
        .select("doc_id", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val half = Curation.shardAssignments(df.filter(col("doc_id") % 2 === 0), nShards)
        .select("doc_id", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val re = Curation.shardAssignments(df.repartition(5), nShards)
        .select("doc_id", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      half.forall { case (id, s) => full(id) == s } && re == full
    }
}
