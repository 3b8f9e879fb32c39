package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.dedup.Dedup
import graft.functions.Text
import graft.multimodal.Media
import graft.similarity.Ann

/** L-block: LLM-data-pipeline operators as driver-verified queries
  * (SURVEY §2 L1–L12) over the documents/embeddings tables.
  * Hash-seeded variants (minhash/simhash/LSH) are rows-only for the
  * driver and asserted against their exact twins in ScalaTest.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  /** Shared L76/L77 driver corpus: documents plus deterministic
    * synthetic rows (the text_pii precedent) — a null text, a 2-token
    * stub, a 1-char-word doc, and %10==9 clones whose keep-verdict
    * originals make the clones exact-dup losers — so every verdict
    * reason code is driver-exercised (the L59 rule). */
  private def verdictCorpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents").select("doc_id", "text", "lang", "source")
    val synth = Seq(
      (2000000L, null.asInstanceOf[String], "en", "synthetic"),
      (2000001L, "too short", "en", "synthetic"),
      (2000002L, "a a a a a a a a a a", "en", "synthetic")
    ).toDF("doc_id", "text", "lang", "source")
    val clones = d.filter(col("doc_id") % 10 === 9)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    d.unionByName(synth).unionByName(clones)
  }

  /** Shared trained-BPE artifacts per sf directory (VERDICT r7 #5): the
    * three BPE driver entries need the SAME k=8 merge table over the
    * same corpus, and retraining it per entry tripled the bench's
    * heaviest block. Keyed by (dir, k) — sound because the driver's sf
    * dirs are immutable testdata; managed-table callers train via
    * [[Curation.trainBpeMerges]] directly. Deliberately NOT registered
    * in [[graft.OperatorCache]]: this is a driver-side MODEL artifact
    * (8 merge rows + ≤ alphabet+k vocab strings), not a persisted
    * frame, and the harnesses clear operator caches between queries —
    * which would defeat exactly the cross-entry sharing this exists
    * for. [[trainBpe]] (the trainer entry) always retrains and
    * refreshes the cache so `text_bpe`'s bench time stays honest
    * training cost; [[trainedBpe]] (the serving entries) reuses. */
  private val bpeArtifacts =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), (Seq[(String, String)], Seq[String])]()

  private def trainBpe(s: SparkSession, dir: String, k: Int = 8): Seq[(Int, String, String, Long)] = {
    val docs = t(s, dir, "documents")
    val rows = Curation.trainBpeMerges(docs, k).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val merges = rows.map(m => (m._2, m._3))
    bpeArtifacts.put((dir, k), (merges, Curation.bpeVocabulary(docs, merges)))
    rows
  }

  /** Trained L50 classifier weights per sf dir — same contract as
    * [[bpeArtifacts]]: model-sized (65 longs), immutable source dirs,
    * trainer entry refreshes, serving entry reuses. */
  private val classifierWeights =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Int, Long]]()

  private def trainedBpe(s: SparkSession, dir: String, k: Int = 8): (Seq[(String, String)], Seq[String]) =
    bpeArtifacts.computeIfAbsent((dir, k), { _ =>
      val docs = t(s, dir, "documents")
      val merges = Curation.trainBpeMerges(docs, k).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      (merges, Curation.bpeVocabulary(docs, merges))
    })

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents")).orderBy("keep_id")

  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents")).orderBy("a_id", "b_id")

  def dedupJaccardAdaptive(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairsAdaptive(t(s, dir, "documents")).orderBy("a_id", "b_id")

  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(t(s, dir, "documents")).orderBy("a_id", "b_id")

  /** L3b: the engine-portable MinHash-LSH twin — md5-derived hashes make
    * the whole candidate stage (signature, banding, bucket join, verify)
    * DuckDB-oracle-exact. See [[Dedup.minhashLshPairsPortable]]. */
  def dedupMinhashPortable(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairsPortable(t(s, dir, "documents")).orderBy("a_id", "b_id")

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(t(s, dir, "documents")).orderBy("a_id", "b_id")

  /** L4b: the engine-portable SimHash twin — md5-derived token hashes
    * make the signature fold, chunk banding and xor-popcount verify
    * DuckDB-oracle-exact. See [[Dedup.simhashPairsPortable]]. */
  def dedupSimhashPortable(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairsPortable(t(s, dir, "documents")).orderBy("a_id", "b_id")

  /** L16: pairwise near-dups → duplicate clusters with a canonical
    * keeper (min doc_id reachable). */
  /** The production clustering default is the O(log n)-round
    * alternating-star algorithm (L16b): the min-label path's round count
    * grows with the longest chain in the pair graph, which made it the
    * heaviest + most contention-sensitive driver query (12.7 s driver vs
    * 3.0 s clean-box in r6 — VERDICT r6 #5). Both implement the SAME
    * labeling contract (spec-pinned equal), so they share one oracle. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.clustersAltStar(Dedup.ngramJaccardPairs(t(s, dir, "documents"))).orderBy("doc_id")

  /** L16: the iterative min-label variant, kept driver-covered under its
    * own key (same oracle — same labeling contract as [[dedupClusters]]). */
  def dedupClustersMinLabel(s: SparkSession, dir: String): DataFrame =
    Dedup.clusters(Dedup.ngramJaccardPairs(t(s, dir, "documents"))).orderBy("doc_id")

  /** L24: asymmetric containment pairs (quote/subset detection). */
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(t(s, dir, "documents")).orderBy("a_id", "b_id")

  /** L22: incremental-ingest dedup — the batch (doc_id % 7 == 0) against
    * the corpus (the rest), cross-side pairs only. */
  def dedupCross(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.crossCorpusPairs(
      docs.filter(col("doc_id") % 7 =!= 0), docs.filter(col("doc_id") % 7 === 0))
      .orderBy("a_id", "b_id")
  }

  /** L16c: the incremental path must converge to the same labeling —
    * pairs split into an old batch + a delta, the delta folded into the
    * old labeling; shares the full-rebuild oracle. */
  def dedupClustersIncr(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.OperatorCache.cached(Dedup.ngramJaccardPairs(t(s, dir, "documents")))
    val oldB = pairs.filter((col("a_id") + col("b_id")) % 3 =!= 0)
    val newB = pairs.filter((col("a_id") + col("b_id")) % 3 === 0)
    Dedup.clustersIncremental(Dedup.clusters(oldB), newB).orderBy("doc_id")
  }

  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingPairs(t(s, dir, "embeddings")).orderBy("a_id", "b_id")

  /** L34: SemDeDup over the embeddings corpus — portable-quantizer
    * clusters, within-cluster cosine pairs ≥ 0.3, keep the member
    * farthest from its cluster seed. See [[Dedup.semanticDedup]]. */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame =
    Dedup.semanticDedup(t(s, dir, "embeddings"), nClusters = 8, tau = 0.3)
      .orderBy("vec_id")

  /** L32: exact substring-duplication stats. Runs the xxhash64 scale
    * path; the oracle mirrors the md5 path — valid because the output
    * carries no hash values and DedupAnnSpec pins the two paths
    * equal. See [[Dedup.substringDupStats]]. */
  def dedupSubstring(s: SparkSession, dir: String): DataFrame =
    Dedup.substringDupStats(t(s, dir, "documents")).orderBy("doc_id")

  def dedupFamilies(s: SparkSession, dir: String): DataFrame =
    Dedup.familiesPairs(t(s, dir, "documents")).orderBy("family", "a_id", "b_id")

  /** L14b: the oracle-exact portable twin of the families pass. */
  def dedupFamiliesPortable(s: SparkSession, dir: String): DataFrame =
    Dedup.familiesPairsPortable(t(s, dir, "documents")).orderBy("family", "a_id", "b_id")

  /** L15: decontamination gate — docs with doc_id % 10 == 0 play the
    * eval set, the rest the train corpus. */
  def contaminationCheck(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.dedup.Contamination.overlap(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0)).orderBy("doc_id")
  }

  /** L70: the SEMANTIC half of the leakage gate — eval vectors
    * (vec_id % 5 == 0) scored against the train rest by best same-label
    * cosine; tau 0.35 splits the corpus 9 contaminated / 91 clean, so
    * both verdicts are driver-exercised. */
  def contaminationSemantic(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    graft.dedup.Contamination.semanticContamination(
      e.filter(col("vec_id") % 5 =!= 0), e.filter(col("vec_id") % 5 === 0))
  }

  private def queriesOf(e: DataFrame): DataFrame = e.filter(col("vec_id") % 50 === 0)

  /** L20: per-label embedding centroids (data-mix / drift primitive). */
  def embeddingCentroids(s: SparkSession, dir: String): DataFrame =
    Ann.labelCentroids(t(s, dir, "embeddings")).orderBy("label", "pos")

  def simTopkBruteforce(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Ann.topKBruteForce(e, queriesOf(e)).orderBy("q_id", "rank")
  }

  def simTopkLsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Ann.topKLsh(e, queriesOf(e)).orderBy("q_id", "rank")
  }

  /** L7 portable twin: md5-derived Rademacher planes + exact integer
    * sign sums make the whole bucket/probe stage DuckDB-oracle-exact.
    * See [[Ann.topKLshPortable]]. */
  def simTopkLshPortable(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Ann.topKLshPortable(e, queriesOf(e)).orderBy("q_id", "rank")
  }

  /** The quantizer is trained ONCE per corpus and reused across query
    * batches — the amortized-training contract (faiss trains once, then
    * add()/search() reuse the model; at 100 TB retraining per query
    * batch would be absurd). Deterministic: trainIvfCentroids is a pure
    * function of the corpus, so the memo changes no results — only which
    * call pays the training cost. */
  private final case class QuantizerKey(
      dir: String, nCentroids: Int, iters: Int, maxTrainRows: Int)

  private val ivfQuantizers =
    new java.util.concurrent.ConcurrentHashMap[QuantizerKey, Seq[Seq[Double]]]()

  /** L7d portable twin: an md5-hash-sampled coarse quantizer + exact
    * integer distances make the whole assign/probe stage
    * DuckDB-oracle-exact. See [[Ann.topKIvfPortable]]. */
  def simTopkIvfPortable(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Ann.topKIvfPortable(e, queriesOf(e)).orderBy("q_id", "rank")
  }

  /** L43: PQ full-scan ADC top-k (Lloyd codebooks memoized like the IVF
    * quantizer). Rows-only: Lloyd + double ADC have no ANSI oracle; the
    * portable twin below converts the same pipeline to hash-verified. */
  def simTopkPq(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val books = pqCodebooks.computeIfAbsent(
      QuantizerKey(dir, nCentroids = 8, iters = 5, maxTrainRows = 65536),
      _ => Ann.trainPqCodebooks(e, m = 4, ksub = 8, iters = 5))
    Ann.topKPq(e, queriesOf(e), codebooks = Some(books)).orderBy("q_id", "rank")
  }

  /** L43b portable twin: hash-sampled sub-codebooks + exact integer ADC
    * — codebooks, codes, distance table, score and rank all exist
    * verbatim in ANSI SQL. See [[Ann.topKPqPortable]]. */
  def simTopkPqPortable(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Ann.topKPqPortable(e, queriesOf(e)).orderBy("q_id", "rank")
  }

  /** L43c: IVF-PQ — coarse-probe pruning × compressed ADC scoring (the
    * faiss IVFADC layout, the actual disk-scale configuration). */
  def simTopkIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Ann.topKIvfPq(e, queriesOf(e)).orderBy("q_id", "rank")
  }

  private val pqCodebooks =
    new java.util.concurrent.ConcurrentHashMap[QuantizerKey, Seq[Seq[Seq[Double]]]]()

  def simTopkIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val cents = ivfQuantizers.computeIfAbsent(
      QuantizerKey(dir, nCentroids = 16, iters = 5, maxTrainRows = 65536),
      _ => Ann.trainIvfCentroids(e, 16, 5))
    Ann.topKIvf(e, queriesOf(e), centroids = Some(cents)).orderBy("q_id", "rank")
  }

  /** The persisted-index path end-to-end: build the IVF index (store
    * tables) on 80% of the corpus, grow it incrementally with the rest,
    * answer through the assignment table. Registered in its PORTABLE
    * form (hash-sampled integer seeds — VERDICT r7 #4) so the stored
    * quantizer, the grown assignment table and the answer all re-derive
    * in the DuckDB oracle and the entry is hash-verified; the
    * Lloyd-trained persisted path ([[Ann.saveIndex]]/topKIvfIndexed)
    * stays the quality path, spec-pinned equal to topKIvf. */
  def simTopkIvfIndexed(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val store = new graft.store.TableStore(s,
      java.nio.file.Files.createTempDirectory("graft_ivf_q_").toString)
    Ann.saveIndexPortable(s, store, "ivf", e.filter(col("vec_id") % 5 =!= 0))
    Ann.growIndexPortable(store, "ivf", e.filter(col("vec_id") % 5 === 0))
    Ann.topKIvfIndexedPortable(store, "ivf", e, queriesOf(e)).orderBy("q_id", "rank")
  }

  /** L43d: the persisted IVF-PQ path end-to-end — build the compressed
    * index on 80% of the corpus, grow it with the rest (no retrain),
    * answer from the index alone (no float-corpus scan). PORTABLE form
    * for the same reason as [[simTopkIvfIndexed]]; the Lloyd persisted
    * path stays spec-pinned. */
  def simTopkIvfPqIndexed(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val store = new graft.store.TableStore(s,
      java.nio.file.Files.createTempDirectory("graft_ivfpq_q_").toString)
    Ann.saveIndexPqPortable(s, store, "pq", e.filter(col("vec_id") % 5 =!= 0))
    Ann.growIndexPqPortable(store, "pq", e.filter(col("vec_id") % 5 === 0))
    Ann.topKIvfPqIndexedPortable(store, "pq", queriesOf(e)).orderBy("q_id", "rank")
  }

  /** L75 driver entry: a stored documents corpus takes ONE deterministic
    * refresh — takedowns (doc_id % 7 == 0 leave), truncation re-crawls
    * (doc_id % 5 == 0 survivors keep only their first 20 tokens; docs
    * at or under 20 tokens are value-identical and must NOT report as
    * changed — the C25 feed drops them, and so does the oracle), and
    * re-crawled clones (doc_id % 11 == 0 re-land under doc_id +
    * 1000000) — and the drift report folds from the change feed of
    * that single merge commit, never a base rescan. */
  def corpusDriftEntry(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val store = new graft.store.TableStore(s,
      java.nio.file.Files.createTempDirectory("graft_drift_").toString)
    store.createTableFromDataFrame("docs", docs, Seq("doc_id"), infer = false)
    val g0 = store.snapshots("docs").last._1
    val trunc = array_join(slice(split(col("text"), " "), 1, 20), " ")
    val post = docs.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, trunc).otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    store.merge("docs", post)
    Curation.corpusDrift(
      store.readChanges("docs", g0, store.snapshots("docs").last._1))
  }

  def textLangid(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), Text.langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val cols = Text.qualityColumns(col("text")).map { case (n, c) => c.as(n) }
    t(s, dir, "documents").select(col("doc_id") +: cols: _*).orderBy("doc_id")
  }

  def textTokens(s: SparkSession, dir: String): DataFrame = {
    val cols = Text.tokenCounts(col("text")).map { case (n, c) => c.as(n) }
    t(s, dir, "documents").select(col("doc_id") +: cols: _*).orderBy("doc_id")
  }

  def textClean(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), Text.clean(col("text")).as("clean_text"))
      .orderBy("doc_id")

  /** L26: Gopher-style repetition filter — see Text.repetitionColumns. */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val cols = Text.repetitionColumns(col("text")).map { case (n, c) => c.as(n) }
    t(s, dir, "documents").select(col("doc_id") +: cols: _*).orderBy("doc_id")
  }

  /** L27: PII redaction. The corpus carries no PII, so deterministic
    * synthetic contact strings are appended first (mirrored in the
    * oracle) — otherwise every count would be zero and the regexes
    * untested. */
  def textPii(s: SparkSession, dir: String): DataFrame = {
    val withPii = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
    val cols = Text.piiColumns(col("text")).map { case (n, c) => c.as(n) }
    withPii.select(col("doc_id") +: cols: _*).orderBy("doc_id")
  }

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** L13: end-to-end training-data pipeline in ONE declarative plan over
    * ONE scan of documents: language-ID → quality gate → exact content
    * dedup (keep-first) → token counting → per-language corpus stats.
    * Every per-row stage (langid, quality, token counts) is a pure
    * expression riding the scan inside whole-stage codegen; the only
    * shuffles are the md5 dedup window and the final tiny aggregate —
    * the shape a 100 TB corpus-curation run wants. */
  def pipelineStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quality = Text.qualityColumns(col("text")).toMap.apply("quality")
    val tok = Text.tokenCounts(col("text")).toMap
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"),
        Text.langId(col("text")).as("pred_lang"),
        quality.as("__q"), tok("ws_tokens").as("__ws"), tok("bpe_tokens").as("__bpe"))
      .filter(col("__q"))
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ws").cast("long")).as("sum_ws_tokens"),
        sum(col("__bpe").cast("long")).as("sum_bpe_tokens"),
        sum(col("n_chars").cast("long")).as("sum_chars"))
      .orderBy("pred_lang")
  }

  /** L17: deterministic per-language quota (training-mix cap). */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Curation.stratifiedCap(t(s, dir, "documents"), "lang", "doc_id", cap = 30)
      .select("doc_id", "lang", "sample_rank").orderBy("lang", "sample_rank")

  /** L31: cluster-balanced diverse sampling — per-cluster quota over the
    * portable quantizer's partition of the embedding space. */
  def sampleDiverse(s: SparkSession, dir: String): DataFrame =
    Curation.diverseSample(t(s, dir, "embeddings"), nClusters = 8, cap = 12)
      .select("vec_id", "cl", "sample_rank").orderBy("cl", "sample_rank")

  /** L23: weighted sampling (A-ES) — length-weighted, 5 docs per lang. */
  def sampleWeighted(s: SparkSession, dir: String): DataFrame =
    Curation.weightedSample(t(s, dir, "documents"), "lang", "doc_id",
        greatest(col("n_chars"), lit(1)).cast("double"), k = 5)
      .select("lang", "doc_id", "n_chars", "sample_rank").orderBy("lang", "sample_rank")

  /** L25: per-language heavy hitters via the native space-saving
    * aggregate (capacity 4096 ≥ test-corpus vocabulary → exact, which
    * the oracle pins; at 100 TB the capacity bounds executor memory
    * where an exact per-term aggregation would shuffle the vocabulary). */
  def textHeavyHitters(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), explode(Text.tokens(col("text"))).as("term"))
      .groupBy("lang")
      .agg(graft.plans.GraftFunctions.topKByFreq(col("term"), 5).as("__top"))
      .select(col("lang"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("lang"), (col("__pos") + 1).cast("int").as("rank"),
        col("__e.term").as("term"), col("__e.cnt").as("cnt"))
      .orderBy("lang", "rank")

  /** L35: top-30 corpus bigrams by occurrence count with exact df.
    * See [[Curation.ngramTopK]]. */
  def textNgrams(s: SparkSession, dir: String): DataFrame =
    Curation.ngramTopK(t(s, dir, "documents"))

  /** L18: top-3 tf-idf terms per document. */
  def textTfidf(s: SparkSession, dir: String): DataFrame =
    Curation.tfidfTopTerms(t(s, dir, "documents")).orderBy("doc_id", "rank")

  /** L19: corpus-unigram LM score per document. */
  def textLogprob(s: SparkSession, dir: String): DataFrame =
    Curation.unigramLogprob(t(s, dir, "documents")).orderBy("doc_id")

  /** L36: hashed-bigram linear classifier score per document.
    * See [[Curation.classifierScore]]. */
  def textClassifier(s: SparkSession, dir: String): DataFrame =
    Curation.classifierScore(t(s, dir, "documents")).orderBy("doc_id")

  /** L37: DSIR importance resample — top-100 documents most like the
    * target slice (target = lang 'en'). See [[Curation.importanceResample]]. */
  def sampleImportance(s: SparkSession, dir: String): DataFrame =
    Curation.importanceResample(t(s, dir, "documents"), col("lang") === "en")

  /** L33: BM25 top-10 retrieval for three fixed keyword queries over
    * the documents corpus. See [[Curation.bm25TopK]]. */
  def textBm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val queries = Seq((1, "spark hash join"), (2, "window agg stream"),
      (3, "fast table scan")).toDF("query_id", "qtext")
    Curation.bm25TopK(t(s, dir, "documents"), queries, k = 10)
      .orderBy("query_id", "rank")
  }

  /** L28: greedy sequence packing into 512-token training sequences,
    * shard-local (8 shards here; see Curation.packSequences). */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Curation.packSequences(d, "lang", "doc_id",
        org.apache.spark.sql.functions.size(Text.tokens(col("text"))), seqLen = 512, shards = 8)
      .orderBy("lang", "pack_shard", "__ord", "doc_id")
      .drop("__ord")
  }

  /** L42: deterministic 8-shard export assignment — per-shard doc
    * count, char mass and max position; the oracle re-derives the md5
    * shard hash and the within-shard rank independently.
    * See [[Curation.shardAssignments]]. */
  def exportShards(s: SparkSession, dir: String): DataFrame =
    Curation.shardAssignments(t(s, dir, "documents"), 8)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        max(col("pos").cast("long")).as("max_pos"))
      .orderBy("shard")

  /** L44: count-min sketch point estimates, probed with the corpus's
    * top-5 exact terms (self-derived so the oracle can rebuild the probe
    * set); the exact count rides along so the one-sided error contract
    * (cms_est ≥ exact_n) is visible in the output.
    * See [[Curation.countMinSketch]]. */
  def textCms(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val probes = d.select(explode(Text.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("t")).limit(5)
      .select(col("t").as("term"), col("exact_n"))
    Curation.cmsEstimate(Curation.countMinSketch(d), probes)
      .join(probes, "term").orderBy("term")
  }

  /** L30: boilerplate stripping — remove terms present in > 80% of
    * documents (on this shared-vocabulary corpus that cuts the handful
    * of truly-everywhere words while keeping most text — non-vacuous in
    * both directions). */
  def textBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val maxDf = (d.count() * 4 / 5).toInt
    Curation.stripBoilerplate(d, maxDf).orderBy("doc_id")
  }

  /** L29: temperature resampling toward shares ∝ n^0.5 over languages. */
  def sampleTemperature(s: SparkSession, dir: String): DataFrame =
    Curation.temperatureSample(t(s, dir, "documents"), "lang", "doc_id")
      .select("lang", "doc_id")
      .orderBy("lang", "doc_id")

  /** L12: real ImageIO decode over deterministic PNG payloads. The
    * oracle states the decoded metadata in closed form from the same
    * row formulas the encoder used — exact iff the codec round-trips. */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame =
    Media.decodeTable(Media.syntheticMediaTable(t(s, dir, "documents")))
      .orderBy("doc_id")

  /** L71: perceptual image dedup — same-gray docs collide on the
    * canonical 8×8 signature ACROSS codecs and stored sizes (id and
    * id+256 differ in format since 256 % 3 = 1 — the cross-format
    * collisions are the point), corrupt docs pass through as trivial
    * keepers. */
  def multimodalPhash(s: SparkSession, dir: String): DataFrame =
    Media.perceptualDedup(Media.syntheticMediaTable(t(s, dir, "documents")))

  /** L71b: perceptual NEAR-dup pairs — Hamming-banded 64-bit signatures
    * over the gradient corpus (structured rasters; a constant image
    * thresholds to all-zero bits and the operator would be vacuous).
    * Same-base images differ only at their planted perturbed tiles
    * (≤ 2 bits); the banded engine must find EXACTLY the naive
    * quadratic truth (pigeonhole: maxDist 3 < 4 bands), which is what
    * the oracle computes from the closed-form rasters. */
  def multimodalPhashNear(s: SparkSession, dir: String): DataFrame =
    Media.perceptualNearDupPairs(
      Media.syntheticGradientTable(t(s, dir, "documents")))

  /** L12e: real resize — every synthetic payload (PNG/JPEG/BMP mix)
    * box-resampled to 8×8; constant-gray inputs must stay exactly
    * constant, so the resized mean is closed-form. */
  def multimodalResize(s: SparkSession, dir: String): DataFrame =
    Media.resizeTable(Media.syntheticMediaTable(t(s, dir, "documents")))
      .orderBy("doc_id")

  /** L12g: ViT-style patch grid — 1 image row fans out to 16 patch
    * rows with exact integer mean/variance features; constant inputs
    * give the closed-form (mean = gray, variance = 0) across all three
    * real codecs, corrupt bytes one sentinel row. */
  def multimodalPatches(s: SparkSession, dir: String): DataFrame =
    Media.patchTable(Media.syntheticMediaTable(t(s, dir, "documents")))
      .orderBy("doc_id", "patch_row", "patch_col")

  /** L12f: real PCM rate conversion — every synthetic WAV resampled to
    * 16 kHz by exact-integer linear interpolation; constant-amplitude
    * inputs stay exactly constant, so the resampled mean is closed-form. */
  def multimodalResample(s: SparkSession, dir: String): DataFrame =
    Media.resampleAudioTable(Media.syntheticAudioTable(t(s, dir, "documents")))
      .orderBy("doc_id")

  def multimodalFrames(s: SparkSession, dir: String): DataFrame =
    Media.frameTable(t(s, dir, "documents")).orderBy("doc_id", "frame_idx")

  /** L12c: the audio twin of [[multimodalDecode]] — real WAV payloads
    * decoded by the hand-rolled RIFF/PCM parser, oracle in closed form
    * from the encoder's row formulas. */
  def multimodalAudio(s: SparkSession, dir: String): DataFrame =
    Media.decodeAudioTable(Media.syntheticAudioTable(t(s, dir, "documents")))
      .orderBy("doc_id")

  /** L12d: real multi-frame decode — animated GIFs (the JDK's one
    * video-like codec) frame-decoded through the 1-row → n-frame-rows
    * fan-out, oracle in closed form from the encoder's row formulas. */
  def multimodalVideo(s: SparkSession, dir: String): DataFrame =
    Media.decodeVideoTable(Media.syntheticVideoTable(t(s, dir, "documents")))
      .orderBy("doc_id", "frame_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    // L57: the corpus's top pair with its shared informative shingles
    "dedup_explain_pair" -> ((s, dir) =>
      Dedup.explainTopPair(t(s, dir, "documents"))),
    // L55: τ calibration table from one verified-pair pass
    "dedup_threshold_report" -> ((s, dir) =>
      Dedup.thresholdReport(t(s, dir, "documents"))),
    // L78: hash-stratified per-band pair sample for human threshold QA
    "dedup_review_queue" -> ((s, dir) =>
      Dedup.reviewQueue(t(s, dir, "documents"))),
    // L79: pair-stage cost pre-flight. maxDf=2 so the cut path is
    // driver-exercised (corpus max df is 4 — the default 128 cuts
    // nothing at sf0.01; the L59 rule)
    "dedup_cost_report" -> ((s, dir) =>
      Dedup.dedupCostReport(t(s, dir, "documents"), maxDf = 2)),
    "dedup_jaccard_adaptive" -> dedupJaccardAdaptive,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_minhash_portable" -> dedupMinhashPortable,
    "dedup_simhash" -> dedupSimhash,
    "dedup_simhash_portable" -> dedupSimhashPortable,
    "dedup_clusters" -> dedupClusters,
    "dedup_clusters_minlabel" -> dedupClustersMinLabel,
    "dedup_clusters_incr" -> dedupClustersIncr,
    "dedup_cross" -> dedupCross,
    "dedup_containment" -> dedupContainment,
    "dedup_embedding" -> dedupEmbedding,
    "dedup_semantic" -> dedupSemantic,
    "dedup_substring" -> dedupSubstring,
    "dedup_despan" -> ((s, dir) =>
      Dedup.removeDupSpans(t(s, dir, "documents")).orderBy("doc_id")),
    // L60: corpus-wide paragraph dedup + reassembly (paragraph =
    // 20-token window on the newline-free synthetic corpus)
    "dedup_paragraph" -> ((s, dir) =>
      Dedup.paragraphDedup(t(s, dir, "documents"))),
    // L65: paragraph-level near-dup pairs (band-only blocking — lang
    // blocking would hide the cross-label reuse)
    "dedup_paragraph_near" -> ((s, dir) =>
      Dedup.paragraphNearDupPairs(t(s, dir, "documents"))),
    // L74: paragraph decontamination — train docs (doc_id % 10 != 0)
    // lose every paragraph that appears in the eval slice (% 10 == 0);
    // the corpus's paragraph-granularity duplication crosses the split,
    // so the cut path is driver-exercised (the L59 budget-must-cut rule)
    "decontam_paragraph" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.decontaminateParagraphs(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0))
    }),
    // L75: per-source doc/token drift folded from one refresh's change feed
    "corpus_drift" -> corpusDriftEntry,
    // L76: per-doc first-failing-gate verdict (empty → lang_mismatch →
    // low_quality → repetitive → duplicate → keep). The corpus alone
    // reaches only lang_mismatch/repetitive/keep, so the entry injects
    // deterministic synthetic rows (the text_pii precedent) — a null
    // text, a 2-token stub, a 1-char-word doc, and %10==9 clones whose
    // keep-verdict originals make the clones exact-dup losers — so
    // every reason code is driver-exercised (the L59 rule)
    "curation_verdicts" -> ((s, dir) =>
      Curation.curationVerdicts(verdictCorpus(s, dir))),
    // L77: per-source data card — verdict-code counts + token inventory
    // over the SAME augmented corpus, so every column is non-zero
    "data_card" -> ((s, dir) => Curation.dataCard(verdictCorpus(s, dir))),
    // L80: NFC scrub — the ASCII corpus is already normalized, so the
    // entry injects decomposed/composed/NULL fixtures (the text_pii
    // precedent) so BOTH the rewrite and the fast path are exercised
    "text_nfc" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents").select("doc_id", "text")
      val synth = Seq(
        (3000000L, "café au lait"),
        (3000001L, "café au lait"),
        (3000002L, "Ångström unit"),
        (3000003L, null.asInstanceOf[String])
      ).toDF("doc_id", "text")
      Curation.nfcNormalizeDocs(d.unionByName(synth))
    }),
    // L67: per-source paragraph reuse + cross-source overlap
    "dedup_source_rate" -> ((s, dir) =>
      Dedup.dedupRateBySource(t(s, dir, "documents"))),
    // L68: per-doc novelty (share of corpus-unique shingles)
    "text_novelty" -> ((s, dir) =>
      Dedup.noveltyScores(t(s, dir, "documents"))),
    "dedup_families" -> dedupFamilies,
    "dedup_families_portable" -> dedupFamiliesPortable,
    "contamination_check" -> contaminationCheck,
    "contamination_semantic" -> contaminationSemantic,
    "embedding_centroids" -> embeddingCentroids,
    "sim_topk_bruteforce" -> simTopkBruteforce,
    "sim_topk_lsh" -> simTopkLsh,
    "sim_topk_lsh_portable" -> simTopkLshPortable,
    "sim_topk_ivf" -> simTopkIvf,
    "sim_topk_ivf_portable" -> simTopkIvfPortable,
    "sim_topk_ivf_indexed" -> simTopkIvfIndexed,
    "sim_topk_pq" -> simTopkPq,
    "sim_topk_pq_portable" -> simTopkPqPortable,
    "sim_topk_ivfpq" -> simTopkIvfPq,
    "sim_topk_ivfpq_indexed" -> simTopkIvfPqIndexed,
    // L61: recall@k of the portable IVF path vs brute-force ground
    // truth — the accept/reject gate before an index replaces the scan
    "sim_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.annRecall(e, queriesOf(e))
    }),
    // L61b: the quantization-loss half — PQ ADC recall vs exact cosine
    "sim_recall_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.annRecallPq(e, queriesOf(e))
    }),
    // L63: IVF list-balance report (skew diagnostic over the portable
    // assignment; empty cells included)
    "sim_index_stats" -> ((s, dir) =>
      Ann.indexStats(t(s, dir, "embeddings"))),
    // L66: per-cell inertia (mean/max exact-integer squared distance) —
    // the elbow-curve companion of the balance report
    "sim_cluster_quality" -> ((s, dir) =>
      Ann.clusterQuality(t(s, dir, "embeddings"))),
    // L49: full-corpus distributed Lloyd — every iteration a cluster-wide
    // pass; oracle = the same two iterations unrolled in SQL
    "sim_kmeans_train" -> ((s, dir) =>
      Ann.kmeansTrain(t(s, dir, "embeddings"), k = 8, iters = 2)),
    "text_langid" -> textLangid,
    "text_quality" -> textQuality,
    "text_tokens" -> textTokens,
    "text_clean" -> textClean,
    "text_repetition" -> textRepetition,
    "text_pii" -> textPii,
    "text_fingerprint" -> textFingerprint,
    "sample_stratified" -> sampleStratified,
    "sample_diverse" -> sampleDiverse,
    "sample_weighted" -> sampleWeighted,
    "pack_sequences" -> packSequences,
    // L69: document-boundary-preserving greedy packing (seqLen 48 so
    // BOTH paths exercise at sf0.01: small docs pack together,
    // >48-token docs take overflow bins of their own)
    "pack_nosplit" -> ((s, dir) =>
      Curation.packNoSplit(t(s, dir, "documents"), "lang", "doc_id",
        org.apache.spark.sql.functions.size(Text.tokens(col("text"))),
        seqLen = 48, shards = 8)),
    "sample_temperature" -> sampleTemperature,
    "text_boilerplate" -> textBoilerplate,
    "text_tfidf" -> textTfidf,
    "text_ngrams" -> textNgrams,
    "text_bm25" -> textBm25,
    "text_heavyhitters" -> textHeavyHitters,
    "text_logprob" -> textLogprob,
    "text_classifier" -> textClassifier,
    // L50: exact-integer-GD linear-probe training (lang='en' target,
    // 64 hashed bigram buckets + bias, 2 unrolled iterations). Like
    // text_bpe, the trainer entry ALWAYS trains (its bench time is
    // training cost) and refreshes the shared model cache the
    // calibration entry consumes — the train → serve contract.
    "text_classifier_train" -> ((s, dir) => {
      val trained = Curation.trainClassifier(t(s, dir, "documents"),
        col("lang") === "en", nBuckets = 64, iters = 2)
      classifierWeights.put(dir, trained.collect()
        .map(r => (r.getInt(0), r.getLong(1))).toMap)
      trained
    }),
    // L52: the trained model's calibration table (train → serve →
    // audit) — serves the CACHED model when the trainer entry already
    // produced it this session (a classifier is trained once and
    // shipped; auditing must not re-pay training), training on demand
    // otherwise.
    "text_classifier_calibration" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = classifierWeights.computeIfAbsent(dir, _ =>
        Curation.trainClassifier(docs, col("lang") === "en",
          nBuckets = 64, iters = 2).collect()
          .map(r => (r.getInt(0), r.getLong(1))).toMap)
      Curation.scoreCalibration(docs, col("lang") === "en",
        (0 to 64).map(b => w.getOrElse(b, 0L)))
    }),
    "sample_importance" -> sampleImportance,
    // L73: uniform source-rebalance plan — exact integer micros
    "sample_mix_plan" -> ((s, dir) =>
      Curation.mixPlan(t(s, dir, "documents"))),
    // L58: greedy best-quality prefix under a token budget (the banded
    // global-cumsum plan; oracle computes the naive global window)
    "sample_token_budget" -> ((s, dir) =>
      Curation.budgetSelect(t(s, dir, "documents"), budgetTokens = 8000L)),
    // L59: the per-group form — each source fills its own 800-token
    // budget with its best documents (800 cuts every source at sf0.01,
    // so the crossing-band path is driver-exercised)
    "sample_token_budget_grouped" -> ((s, dir) =>
      Curation.budgetSelectPerGroup(t(s, dir, "documents"), "source",
        budgetPerGroup = 800L)),
    // L59b: a real mixture SPEC — src0..src4 get 800 tokens, src5..src9
    // get 400, every other source is OMITTED (budget 0 by omission)
    "sample_token_budget_spec" -> ((s, dir) =>
      Curation.budgetSelectMixture(t(s, dir, "documents"), "source",
        ((0 to 4).map(i => s"src$i" -> 800L) ++
          (5 to 9).map(i => s"src$i" -> 400L)).toMap)),
    // L72: curriculum phases over the corpus-wide quality order —
    // 3 phases at sf0.01 put ~167 docs per phase with the boundary
    // bands paying the only windows
    "sample_curriculum" -> ((s, dir) =>
      Curation.curriculumPhases(t(s, dir, "documents"))),
    "export_shards" -> exportShards,
    "text_cms" -> textCms,
    "source_quality" -> ((s, dir) =>
      Curation.sourceQuality(t(s, dir, "documents")).orderBy("source")),
    "text_bigram" -> ((s, dir) =>
      Curation.bigramLogprob(t(s, dir, "documents")).orderBy("doc_id")),
    // L46: the distributed trainer, now ORACLE-EXACT — the sentinel-
    // string replay (see bpeMergeCtes) expresses all 8 merge rounds in
    // DuckDB SQL; the in-memory classic-BPE twin stays in CurationSpec.
    // text_bpe always retrains (it IS the trainer — its bench time must
    // be training cost) and refreshes the shared artifact cache the two
    // downstream entries consume.
    "text_bpe" -> ((s, dir) => {
      import s.implicits._
      trainBpe(s, dir).toDF("merge_rank", "left", "right", "pair_count")
        .orderBy("merge_rank")
    }),
    // L56: per-lang fertility under the trained merges, oracle-exact
    // via the same merge CTE chain + the integer-micros ratio idiom.
    // Consumes the trained-artifact cache (a tokenizer is trained once
    // and shipped; the serving queries must not re-pay training).
    "text_fertility" -> ((s, dir) =>
      Curation.fertilityReport(t(s, dir, "documents"), trainedBpe(s, dir)._1)),
    // L64: round-trip decode under the shared trained tokenizer — the
    // oracle IS the round-trip contract (decode must reconstruct the
    // space-stripped text, ok = true for every doc)
    "text_detokenize" -> ((s, dir) => {
      val (merges, vocab) = trainedBpe(s, dir)
      Curation.decodeBpe(t(s, dir, "documents"), merges, vocab)
    }),
    // L54: the full tokenize capstone — train → encode → pack. The
    // driver face is the scalar-checksum projection (pandas sort_values
    // cannot factorize array cells — VERDICT r7 #1); the raw input_ids
    // surface + classic in-memory twin stay in CurationSpec. Oracle-
    // exact: merges, vocab ids, md5 shard layout and the packed
    // per-sequence digests all re-derive in SQL.
    "text_training_sequences" -> ((s, dir) => {
      val (merges, vocab) = trainedBpe(s, dir)
      Curation.trainingSequenceChecksums(t(s, dir, "documents"), merges, vocab,
        seqLen = 128, shards = 16)
    }),
    "text_chunks" -> ((s, dir) => Curation.chunkDocuments(t(s, dir, "documents"))),
    // L51: per-language OOV share under the deterministic top-V vocab
    // vocabSize 20 < the 31-term synthetic vocabulary, so the OOV side
    // is non-vacuous at every SF
    "text_vocab_coverage" -> ((s, dir) =>
      Curation.vocabCoverage(t(s, dir, "documents"), vocabSize = 20)),
    // L62: per-source lexical-diversity profile (TTR, hapax share,
    // top-term share — exact integer micros)
    "text_lexdiv" -> ((s, dir) =>
      Curation.lexicalDiversity(t(s, dir, "documents"))),
    "embedding_quantize" -> ((s, dir) => Ann.quantizeInt8(t(s, dir, "embeddings"))),
    "dedup_keeper_quality" -> ((s, dir) => Dedup.clustersQualityKeeper(t(s, dir, "documents"))),
    "dedup_cluster_split" -> ((s, dir) => Dedup.clusterSafeSplit(t(s, dir, "documents"))),
    "multimodal_decode" -> multimodalDecode,
    "multimodal_phash" -> multimodalPhash,
    "multimodal_phash_near" -> multimodalPhashNear,
    "multimodal_resize" -> multimodalResize,
    "multimodal_patches" -> multimodalPatches,
    "multimodal_resample" -> multimodalResample,
    "multimodal_frames" -> multimodalFrames,
    "multimodal_audio" -> multimodalAudio,
    "multimodal_video" -> multimodalVideo,
    "pipeline_stats" -> pipelineStats,
  )

  private val langCase: String = {
    val langs = Text.Stopwords.map(_._1)
    val counts = Text.Stopwords.map { case (l, ws) =>
      l -> s"len(list_intersect(string_split(text,' '), [${ws.map(w => s"'$w'").mkString(",")}]))"
    }.toMap
    val hit = langs.map(counts).mkString(" + ") + " > 0"
    val branches = langs.map { l =>
      val ge = langs.filterNot(_ == l).map(o => s"${counts(l)} >= ${counts(o)}").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }.mkString(" ")
    s"CASE WHEN NOT ($hit) THEN 'und' $branches END"
  }

  /** First `digits` hex digits of a (lowercase-hex) expression as a
    * BIGINT — the A14b idiom: strpos-based digit decode with INTEGER
    * multipliers (exact up to 15 digits = 60 bits; doubles would lose
    * exactness past 2^53). */
  private def duckHex(hexExpr: String, digits: Int): String =
    (1 to digits).map { i =>
      val mult = 1L << (4 * (digits - i))
      s"(strpos('0123456789abcdef', substr($hexExpr,$i,1))-1)*$mult"
    }.mkString(" + ")
  private[operators] def duckHex8(hexExpr: String): String = duckHex(hexExpr, 8)

  /** The k=8 BPE merge-training CTE chain (`w0..w8`, `m1..m8`,
    * `merges`) — the L46 trainer re-derived in SQL. Each round counts
    * adjacent symbol pairs over the weighted word vocabulary, takes the
    * (count desc, a, b) argmax, and rewrites every word via
    * sentinel-delimited string replace: each symbol is wrapped
    * chr(2)…chr(3), so the pattern chr(2)a chr(3)chr(2)b chr(3) can
    * never falsely match across symbol boundaries, and replace-all's
    * left-to-right non-overlapping scan is exactly the single-pass fold
    * semantics of [[Curation.bpeMergeStep]] (a merged token never
    * re-participates as the left side within the same round). */
  private lazy val bpeMergeCtes: String = {
    val rounds = (1 to 8).map { r =>
      s"""p$r AS (
         | SELECT l[CAST(i AS INT)] AS a, l[CAST(i AS INT)+1] AS b, CAST(SUM(cnt) AS BIGINT) AS n
         | FROM (SELECT string_split(substr(rep, 2, length(rep)-2), chr(3)||chr(2)) AS l, cnt FROM w${r - 1}),
         |  UNNEST(range(1, len(l))) AS u(i)
         | GROUP BY 1, 2),
         |m$r AS (SELECT a, b, n FROM p$r ORDER BY n DESC, a, b LIMIT 1),
         |w$r AS (
         | SELECT w, replace(rep, chr(2)||m.a||chr(3)||chr(2)||m.b||chr(3), chr(2)||m.a||m.b||chr(3)) AS rep, cnt
         | FROM w${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (
       | SELECT w, chr(2) || array_to_string(string_split(w, ''), chr(3)||chr(2)) || chr(3) AS rep, COUNT(*) AS cnt
       | FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
       |$rounds,
       |merges AS (${(1 to 8).map(r => s"SELECT $r AS merge_rank, a, b, n FROM m$r").mkString(" UNION ALL ")})""".stripMargin
  }

  /** The MinHash signature parameters as a DuckDB VALUES list — the SAME
    * constants the native expression uses (plans/MinHashSignature), so
    * the oracle's modular arithmetic is bit-identical. */
  private val mhParamValues: String = {
    val as = graft.plans.MinHashSignature.paramsA(63)
    val bs = graft.plans.MinHashSignature.paramsB(63)
    (0 until 63).map(j => s"(${j},${as(j)},${bs(j)})").mkString(",")
  }

  /** Portable MinHash-LSH oracle body (no ORDER BY — reused standalone
    * and inside the portable-families union): md5-derived shingle hash,
    * the SAME signature constants as the native expression, md5 band
    * keys, exact-jaccard verification. */
  private lazy val minhashPortableBody: String =
    s"""WITH tok AS (
       | SELECT doc_id, lang, CAST(n_chars // 50 AS INT) AS band, string_split(text, ' ') AS toks
       | FROM documents),
       |sh AS (
       | SELECT DISTINCT doc_id, lang, band, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
       | FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
       | WHERE len(toks) >= 3),
       |hx AS (
       | SELECT doc_id, lang, band,
       |  CAST(${duckHex8("md5(s)")} AS BIGINT) % 2147483647 AS x
       | FROM sh),
       |params AS (SELECT * FROM (VALUES $mhParamValues) t(j, a, b)),
       |sig AS (
       | SELECT doc_id, lang, band, j, MIN((a * x + b) % 2147483647) AS h
       | FROM hx, params GROUP BY doc_id, lang, band, j),
       |bk AS (
       | SELECT doc_id, lang, band,
       |  md5(CAST(j // 3 AS VARCHAR) || ',' || string_agg(CAST(h AS VARCHAR), ',' ORDER BY j)) AS k
       | FROM sig GROUP BY doc_id, lang, band, j // 3),
       |cand AS (
       | SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       | FROM bk a JOIN bk b
       |  ON a.k = b.k AND a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |ver AS (
       | SELECT c.a_id, c.b_id, COUNT(*) AS inter
       | FROM cand c
       | JOIN sh sa ON sa.doc_id = c.a_id
       | JOIN sh sb ON sb.doc_id = c.b_id AND sa.s = sb.s
       | GROUP BY c.a_id, c.b_id)
       |SELECT v.a_id AS a_id, v.b_id AS b_id,
       | ROUND(v.inter * 1.0 / (sa.n + sb.n - v.inter), 6) AS jaccard
       |FROM ver v JOIN sizes sa ON v.a_id = sa.doc_id JOIN sizes sb ON v.b_id = sb.doc_id
       |WHERE ROUND(v.inter * 1.0 / (sa.n + sb.n - v.inter), 6) >= 0.3""".stripMargin

  /** Portable SimHash oracle body (no ORDER BY): md5-derived 60-bit
    * token hashes; signature bits 60–63 are constant zero on both
    * engines, so the fold covers j in 0..59 only (also avoiding 1<<63
    * overflow). */
  private lazy val simhashPortableBody: String =
    s"""WITH tok AS (
       | SELECT doc_id, lang, CAST(n_chars // 50 AS INT) AS band,
       |  unnest(string_split(text, ' ')) AS t
       | FROM documents),
       |th AS (
       | SELECT doc_id, lang, band, CAST(${duckHex("md5(t)", 15)} AS BIGINT) AS h
       | FROM tok),
       |bits AS (
       | SELECT doc_id, lang, band, j,
       |  CASE WHEN SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
       |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS b
       | FROM th, (SELECT unnest(range(0, 60)) AS j) js
       | GROUP BY doc_id, lang, band, j),
       |sig AS (
       | SELECT doc_id, lang, band, CAST(SUM(b * (CAST(1 AS BIGINT) << j)) AS BIGINT) AS s
       | FROM bits GROUP BY doc_id, lang, band),
       |ch AS (
       | SELECT doc_id, lang, band, s, ((s >> (16 * c)) & 65535) + c * 65536 AS k
       | FROM sig, (SELECT unnest(range(0, 4)) AS c) cs),
       |cand AS (
       | SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
       | FROM ch a JOIN ch b
       |  ON a.k = b.k AND a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id, hamming FROM cand
       |WHERE hamming <= 6""".stripMargin

  /** Exact-jaccard oracle body (no ORDER BY — reused standalone and
    * inside the portable-families union). */
  /** The shared jaccard CTE prefix (tok → shingles → df-cut kept →
    * sizes → intersection pairs) — reused by the pair oracle, the L55
    * threshold oracle and the L57 explain oracle so the blocking and
    * df-cut semantics cannot drift between them. */
  private val jaccardKeptCtes: String =
    """WITH tok AS (
      | SELECT doc_id, lang, CAST(n_chars // 50 AS INT) AS band, string_split(text, ' ') AS toks
      | FROM documents),
      |sh AS (
      | SELECT DISTINCT doc_id, lang, band, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
      | FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
      | WHERE len(toks) >= 3),
      |kept AS (
      | SELECT * FROM (
      |  SELECT doc_id, lang, band, s, COUNT(*) OVER (PARTITION BY lang, band, s) AS df FROM sh)
      | WHERE df <= 128),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
      |pairs AS (
      | SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      | FROM kept a JOIN kept b ON a.s = b.s AND a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
      | GROUP BY a.doc_id, b.doc_id)""".stripMargin

  private val jaccardOracleBody: String =
    s"""$jaccardKeptCtes
      |SELECT a_id, b_id, ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
      |FROM pairs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
      |WHERE ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.3""".stripMargin

  /** Connected-components oracle shared by `dedup_clusters` (alternating
    * star) and `dedup_clusters_minlabel` — both operators implement the
    * SAME labeling contract (min reachable doc_id), only the iteration
    * schedule differs, so one recursive-CTE oracle pins both. */
  private val clustersOracle: String =
    """WITH RECURSIVE tok AS (
      | SELECT doc_id, lang, CAST(n_chars // 50 AS INT) AS band, string_split(text, ' ') AS toks
      | FROM documents),
      |sh AS (
      | SELECT DISTINCT doc_id, lang, band, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
      | FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
      | WHERE len(toks) >= 3),
      |kept AS (
      | SELECT * FROM (
      |  SELECT doc_id, lang, band, s, COUNT(*) OVER (PARTITION BY lang, band, s) AS df FROM sh)
      | WHERE df <= 128),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
      |prs AS (
      | SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      | FROM kept a JOIN kept b ON a.s = b.s AND a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
      | GROUP BY a.doc_id, b.doc_id),
      |pairs AS (
      | SELECT a_id, b_id FROM prs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
      | WHERE ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.3),
      |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs UNION SELECT b_id, a_id FROM pairs),
      |reach AS (
      | SELECT src AS id, dst AS r FROM edges
      | UNION
      | SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src)
      |SELECT id AS doc_id, LEAST(id, MIN(r)) AS cluster_id,
      | (id = LEAST(id, MIN(r))) AS keep
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** The L50 training CTE chain (both GD iterations unrolled to the
    * final weight table `w2`) — shared by the trainer oracle and the
    * L52 calibration oracle so the two cannot drift. */
  private lazy val classifierTrainCtes: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
         |  CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS tt FROM documents),
         |g AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
         |      FROM t, UNNEST(range(1, len(w))) AS u(i) WHERE len(w) >= 2),
         |xb AS (
         | SELECT doc_id,
         |  CAST(CAST(${duckHex8("md5('w|' || gram)")} AS BIGINT) % 64 AS INT) AS bucket,
         |  COUNT(*) AS x
         | FROM g GROUP BY doc_id, bucket
         | UNION ALL SELECT doc_id, 64 AS bucket, 1 AS x FROM t),
         |tr AS (SELECT SUM(x * x) AS tv FROM xb),
         |g1 AS (SELECT bucket, SUM((0 - t.tt) * x) AS gr
         |       FROM xb JOIN t USING (doc_id) GROUP BY bucket),
         |w1 AS (SELECT bucket,
         |  -(CASE WHEN gr < 0 THEN -((2 * (-gr) + tr.tv) // (2 * tr.tv))
         |         ELSE (2 * gr + tr.tv) // (2 * tr.tv) END) AS wm
         | FROM g1, tr),
         |p2 AS (SELECT doc_id, SUM(w1.wm * x) AS p
         |       FROM xb JOIN w1 USING (bucket) GROUP BY doc_id),
         |e2 AS (SELECT t.doc_id, p2.p - t.tt AS e FROM p2 JOIN t ON p2.doc_id = t.doc_id),
         |g2 AS (SELECT bucket, SUM(e * x) AS gr
         |       FROM xb JOIN e2 USING (doc_id) GROUP BY bucket),
         |w2 AS (SELECT g2.bucket,
         |  w1.wm - (CASE WHEN g2.gr < 0 THEN -((2 * (-g2.gr) + tr.tv) // (2 * tr.tv))
         |                ELSE (2 * g2.gr + tr.tv) // (2 * tr.tv) END) AS wm
         | FROM g2 JOIN w1 USING (bucket), tr)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "dedup_ngram_jaccard" -> s"$jaccardOracleBody\nORDER BY a_id, b_id",
    // dedup_explain_pair: the shared kept CTEs + the top pair by
    // (jaccard desc, ids) joined back to both sides' surviving shingles
    "dedup_explain_pair" ->
      s"""$jaccardKeptCtes,
         |jp AS (SELECT a_id, b_id, ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
         |  FROM pairs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         |  WHERE ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.3),
         |top AS (SELECT a_id, b_id, jaccard FROM (
         |  SELECT jp.*, ROW_NUMBER() OVER (ORDER BY jaccard DESC, a_id, b_id) AS rn
         |  FROM jp) WHERE rn = 1)
         |SELECT t.a_id, t.b_id, t.jaccard, k.s AS shingle, CAST(k.df AS BIGINT) AS df
         |FROM top t
         | JOIN kept k ON k.doc_id = t.a_id
         | JOIN kept k2 ON k2.doc_id = t.b_id AND k2.s = k.s
         |ORDER BY shingle""".stripMargin,
    // dedup_threshold_report: the shared jaccard CTE + integer-micros
    // cumulative counts per candidate τ (pairs ≥ τ; docs whose best
    // pair ≥ τ); zero rows still emit
    "dedup_threshold_report" ->
      s"""WITH jp AS ($jaccardOracleBody),
         |j6 AS (SELECT a_id, b_id, CAST(ROUND(jaccard * 1000000, 0) AS BIGINT) AS j
         |       FROM jp),
         |taus AS (SELECT CAST(t * 50000 AS BIGINT) AS tau_micros FROM range(6, 20) r(t)),
         |pc AS (SELECT tau_micros, COUNT(*) AS n_pairs
         |       FROM taus JOIN j6 ON j >= tau_micros GROUP BY tau_micros),
         |db AS (SELECT doc_id, MAX(j) AS best FROM (
         |        SELECT a_id AS doc_id, j FROM j6
         |        UNION ALL SELECT b_id AS doc_id, j FROM j6) GROUP BY doc_id),
         |dc AS (SELECT tau_micros, COUNT(*) AS n_docs
         |       FROM taus JOIN db ON best >= tau_micros GROUP BY tau_micros)
         |SELECT t.tau_micros, CAST(t.tau_micros AS DOUBLE) / 1000000.0 AS tau,
         | CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
         | CAST(COALESCE(n_docs, 0) AS BIGINT) AS n_docs
         |FROM taus t LEFT JOIN pc USING (tau_micros) LEFT JOIN dc USING (tau_micros)
         |ORDER BY tau_micros""".stripMargin,

    // L78: same pair relation, 0.1-wide bands, md5(a:b) priority, top-k
    // per band — rank cast BIGINT both sides
    "dedup_review_queue" ->
      s"""WITH jp AS ($jaccardOracleBody),
         |b AS (SELECT a_id, b_id,
         |       CAST(ROUND(jaccard * 1000000, 0) AS BIGINT) AS j,
         |       (CAST(ROUND(jaccard * 1000000, 0) AS BIGINT) // 100000) * 100000 AS band_micros,
         |       md5(a_id || ':' || b_id) AS pr
         |      FROM jp),
         |r AS (SELECT band_micros, a_id, b_id, j,
         |       ROW_NUMBER() OVER (PARTITION BY band_micros ORDER BY pr, a_id, b_id) AS rank
         |      FROM b)
         |SELECT band_micros, CAST(rank AS BIGINT) AS rank, a_id, b_id,
         | j AS jaccard_micros
         |FROM r WHERE rank <= 5
         |ORDER BY band_micros, rank""".stripMargin,

    // L80: DuckDB nfc_normalize (utf8proc) vs the native expression
    // (java.text.Normalizer) — both canonical composition; fixtures
    // built with chr() so the SQL is byte-explicit
    "text_nfc" ->
      """WITH corpus AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL SELECT 3000000, 'cafe' || chr(769) || ' au lait'
        | UNION ALL SELECT 3000001, 'caf' || chr(233) || ' au lait'
        | UNION ALL SELECT 3000002, 'A' || chr(778) || 'ngstro' || chr(776) || 'm unit'
        | UNION ALL SELECT 3000003, NULL)
        |SELECT doc_id, nfc_normalize(text) AS text_nfc,
        | (text <> nfc_normalize(text)) AS changed
        |FROM corpus ORDER BY doc_id""".stripMargin,

    // L79: df rollup per (lang, band, shingle) → block summary; the
    // C(df,2) arithmetic in exact integers, HUGEINT sums cast BIGINT
    "dedup_cost_report" ->
      """WITH tok AS (
        | SELECT doc_id, lang, CAST(n_chars // 50 AS INT) AS band,
        |  string_split(text, ' ') AS toks
        | FROM documents),
        |sh AS (
        | SELECT DISTINCT doc_id, lang, band, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        | FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
        | WHERE len(toks) >= 3),
        |dfs AS (SELECT lang, band, s, COUNT(*) AS df FROM sh GROUP BY 1, 2, 3),
        |nd AS (SELECT lang, band, COUNT(DISTINCT doc_id) AS n_docs FROM sh GROUP BY 1, 2)
        |SELECT d.lang, d.band, CAST(nd.n_docs AS BIGINT) AS n_docs,
        | CAST(COUNT(*) AS BIGINT) AS n_shingles,
        | CAST(SUM(CASE WHEN df <= 2 THEN df * (df - 1) // 2 ELSE 0 END) AS BIGINT) AS est_pairs,
        | CAST(SUM(CASE WHEN df > 2 THEN 1 ELSE 0 END) AS BIGINT) AS cut_shingles,
        | CAST(SUM(CASE WHEN df > 2 THEN df * (df - 1) // 2 ELSE 0 END) AS BIGINT) AS cut_pairs
        |FROM dfs d JOIN nd USING (lang, band)
        |GROUP BY d.lang, d.band, nd.n_docs
        |ORDER BY d.lang, d.band""".stripMargin,

    // sample_token_budget: the naive global-prefix form of the banded
    // selection — (score desc, doc_id) cumulative ≤ budget
    // L72: the oracle is the NAIVE global rank — the banded plan must
    // reproduce it row-for-row
    "sample_curriculum" ->
      """WITH q AS (
        | SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS BIGINT) AS stop
        | FROM documents),
        |s AS (SELECT doc_id, n_tokens,
        |  CAST((2 * 1000000 * stop + n_tokens) // (2 * n_tokens) AS BIGINT) AS score_micros
        | FROM q),
        |r AS (SELECT doc_id, n_tokens, score_micros,
        |  ROW_NUMBER() OVER (ORDER BY score_micros DESC, doc_id) - 1 AS p,
        |  COUNT(*) OVER () AS n FROM s)
        |SELECT doc_id, n_tokens, score_micros, CAST((p * 3) // n AS INT) AS phase
        |FROM r ORDER BY doc_id""".stripMargin,
    // L73: the same floor-exact integer arithmetic over the grouped
    // token inventory
    "sample_mix_plan" ->
      """WITH g AS (SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        | FROM documents WHERE text IS NOT NULL GROUP BY source),
        |t AS (SELECT COUNT(*) AS ng, CAST(SUM(n_tokens) AS BIGINT) AS tt FROM g)
        |SELECT source, n_docs, n_tokens,
        | tt // ng AS target_tokens,
        | least(1000000, (tt // ng) * 1000000 // n_tokens) AS rate_micros,
        | n_tokens * least(1000000, (tt // ng) * 1000000 // n_tokens) // 1000000 AS expected_tokens
        |FROM g, t ORDER BY source""".stripMargin,
    "sample_token_budget" ->
      """WITH q AS (
        | SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS BIGINT) AS stop
        | FROM documents),
        |s AS (SELECT doc_id, n_tokens,
        |  CAST((2 * 1000000 * stop + n_tokens) // (2 * n_tokens) AS BIGINT) AS score_micros
        | FROM q),
        |c AS (SELECT doc_id, n_tokens, score_micros,
        |  CAST(SUM(n_tokens) OVER (ORDER BY score_micros DESC, doc_id) AS BIGINT) AS cum
        | FROM s)
        |SELECT doc_id, n_tokens, score_micros FROM c WHERE cum <= 8000
        |ORDER BY doc_id""".stripMargin,
    // sample_token_budget_grouped: the per-source naive windows
    "sample_token_budget_grouped" ->
      """WITH q AS (
        | SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS BIGINT) AS stop
        | FROM documents),
        |s AS (SELECT source, doc_id, n_tokens,
        |  CAST((2 * 1000000 * stop + n_tokens) // (2 * n_tokens) AS BIGINT) AS score_micros
        | FROM q),
        |c AS (SELECT source, doc_id, n_tokens, score_micros,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY score_micros DESC, doc_id) AS BIGINT) AS cum
        | FROM s)
        |SELECT source, doc_id, n_tokens, score_micros FROM c WHERE cum <= 800
        |ORDER BY source, doc_id""".stripMargin,
    // sample_token_budget_spec: per-source naive windows against the
    // CASE-rendered mixture spec (omitted sources → budget 0)
    "sample_token_budget_spec" ->
      """WITH q AS (
        | SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS BIGINT) AS stop
        | FROM documents),
        |s AS (SELECT source, doc_id, n_tokens,
        |  CAST((2 * 1000000 * stop + n_tokens) // (2 * n_tokens) AS BIGINT) AS score_micros
        | FROM q),
        |c AS (SELECT source, doc_id, n_tokens, score_micros,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY score_micros DESC, doc_id) AS BIGINT) AS cum,
        |  CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 800
        |       WHEN source IN ('src5','src6','src7','src8','src9') THEN 400
        |       ELSE 0 END AS budget
        | FROM s)
        |SELECT source, doc_id, n_tokens, score_micros FROM c WHERE cum <= budget
        |ORDER BY source, doc_id""".stripMargin,
    // source_quality: the L32 span CTEs + the text_quality stopword
    // expression rolled up per source with exact integer-micros means
    "source_quality" ->
      """WITH t AS (
        | SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |q AS (
        | SELECT doc_id, source, len(toks) AS n,
        |  len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS stop
        | FROM t),
        |w AS (
        | SELECT doc_id, i AS pos, md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS h
        | FROM t, UNNEST(generate_series(1, len(toks) - 7)) AS u(i)
        | WHERE len(toks) >= 8),
        |dup AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        |dpos AS (
        | SELECT w.doc_id, w.pos,
        |   CASE WHEN w.pos - lag(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos) <= 8
        |        THEN 0 ELSE 1 END AS brk
        | FROM w JOIN dup USING (h)),
        |isl AS (
        | SELECT doc_id, pos,
        |   SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM dpos),
        |spans AS (
        | SELECT doc_id, island, MIN(pos) AS s, MAX(pos) AS e
        | FROM isl GROUP BY doc_id, island),
        |perdoc AS (
        | SELECT doc_id, CAST(SUM(e - s + 8) AS BIGINT) AS dup_tokens
        | FROM spans GROUP BY doc_id),
        |d AS (
        | SELECT t.doc_id, len(t.toks) AS nt, COALESCE(p.dup_tokens, 0) AS dt
        | FROM t LEFT JOIN perdoc p USING (doc_id)),
        |m AS (
        | SELECT q.source,
        |  (2 * 1000000 * q.stop + q.n) // (2 * q.n) AS stopm,
        |  (2 * 1000000 * d.dt + d.nt) // (2 * d.nt) AS dupm
        | FROM q JOIN d USING (doc_id))
        |SELECT source, COUNT(*) AS n_docs,
        | CAST(CAST((2 * SUM(stopm) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS DOUBLE) / 1000000.0 AS mean_stopword_ratio,
        | CAST(CAST((2 * SUM(dupm) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS DOUBLE) / 1000000.0 AS mean_dup_frac,
        | ((2 * SUM(stopm) + COUNT(*)) // (2 * COUNT(*)) < 55000
        |  OR (2 * SUM(dupm) + COUNT(*)) // (2 * COUNT(*)) > 50000) AS blocked
        |FROM m GROUP BY source ORDER BY source""".stripMargin,
    // text_novelty: corpus-wide shingle df on md5 keys, per-doc share
    // of df=1 shingles in exact floor micros
    "text_novelty" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id,
        |  md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS h
        | FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
        | WHERE len(toks) >= 3),
        |df AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY h)
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        | CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        | (CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |   // CAST(COUNT(*) AS BIGINT) AS novelty_micros
        |FROM sh s JOIN df f USING (h) GROUP BY s.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    // dedup_source_rate: the paragraph relation rolled up per source —
    // occurrences losing the corpus-wide winner rule, and distinct
    // contents shared with another source
    "dedup_source_rate" ->
      """WITH t AS (SELECT source, doc_id, string_split(text, ' ') AS toks,
        |  len(string_split(text, ' ')) AS n FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT source, doc_id, CAST(i AS INT) AS para_idx,
        |  md5(array_to_string(list_slice(toks, CAST(i*20+1 AS INT), CAST(i*20+20 AS INT)), ' ')) AS h
        | FROM t, UNNEST(range(0, CASE WHEN n <= 20 THEN 1 ELSE CAST(CEIL(n*1.0/20) AS INT) END)) AS u(i)),
        |w AS (SELECT h, doc_id AS w_doc, para_idx AS w_idx FROM (
        |  SELECT h, doc_id, para_idx,
        |   ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, para_idx) AS rn FROM p)
        | WHERE rn = 1),
        |occ AS (SELECT p.source,
        |  CASE WHEN p.doc_id = w.w_doc AND p.para_idx = w.w_idx THEN 0 ELSE 1 END AS dup
        | FROM p JOIN w USING (h)),
        |d AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_paras,
        |  CAST(SUM(dup) AS BIGINT) AS n_dup FROM occ GROUP BY source),
        |sc AS (SELECT DISTINCT source, h FROM p),
        |cs AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS ns FROM sc GROUP BY h),
        |sh AS (SELECT s.source, CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  CAST(SUM(CASE WHEN c.ns > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        | FROM sc s JOIN cs c USING (h) GROUP BY s.source)
        |SELECT d.source, d.n_paras, d.n_dup,
        | (d.n_dup * 1000000) // d.n_paras AS dup_micros,
        | sh.n_distinct, sh.n_shared,
        | (sh.n_shared * 1000000) // sh.n_distinct AS shared_micros
        |FROM d JOIN sh ON d.source = sh.source
        |ORDER BY d.source""".stripMargin,
    // dedup_paragraph_near: the jaccard kept/pair CTEs over the
    // paragraph relation (pid = doc_id*2^20 + idx), band-only blocking
    "dedup_paragraph_near" ->
      """WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks0,
        |  len(string_split(text, ' ')) AS n0 FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT doc_id * 1048576 + CAST(i AS BIGINT) AS pid,
        |  array_to_string(list_slice(toks0, CAST(i*20+1 AS INT), CAST(i*20+20 AS INT)), ' ') AS text
        | FROM t0, UNNEST(range(0, CASE WHEN n0 <= 20 THEN 1 ELSE CAST(CEIL(n0*1.0/20) AS INT) END)) AS u(i)),
        |tok AS (SELECT pid AS doc_id, CAST(length(text) // 50 AS INT) AS band,
        |  string_split(text, ' ') AS toks FROM p),
        |sh AS (
        | SELECT DISTINCT doc_id, band, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        | FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
        | WHERE len(toks) >= 3),
        |kept AS (
        | SELECT * FROM (
        |  SELECT doc_id, band, s, COUNT(*) OVER (PARTITION BY band, s) AS df FROM sh)
        | WHERE df <= 128),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        |prs AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.band = b.band AND a.doc_id < b.doc_id
        | GROUP BY a.doc_id, b.doc_id),
        |j AS (
        | SELECT a_id, b_id, ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
        | FROM prs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
        | WHERE ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.3)
        |SELECT a_id // 1048576 AS a_doc, CAST(a_id % 1048576 AS INT) AS a_idx,
        | b_id // 1048576 AS b_doc, CAST(b_id % 1048576 AS INT) AS b_idx, jaccard
        |FROM j ORDER BY a_doc, a_idx, b_doc, b_idx""".stripMargin,
    // dedup_paragraph: 20-token windows, first occurrence (min doc_id,
    // para_idx) wins corpus-wide, survivors rejoin in window order
    "dedup_paragraph" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |  len(string_split(text, ' ')) AS n FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT doc_id, CAST(i AS INT) AS para_idx,
        |  array_to_string(list_slice(toks, CAST(i*20+1 AS INT), CAST(i*20+20 AS INT)), ' ') AS para_text
        | FROM t, UNNEST(range(0, CASE WHEN n <= 20 THEN 1 ELSE CAST(CEIL(n*1.0/20) AS INT) END)) AS u(i)),
        |w AS (SELECT doc_id, para_idx, para_text FROM (
        |  SELECT doc_id, para_idx, para_text,
        |   ROW_NUMBER() OVER (PARTITION BY para_text ORDER BY doc_id, para_idx) AS rn FROM p)
        | WHERE rn = 1),
        |reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  string_agg(para_text, ' ' ORDER BY para_idx) AS clean_text
        | FROM w GROUP BY doc_id),
        |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras FROM p GROUP BY doc_id)
        |SELECT c.doc_id, c.n_paras, CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
        | COALESCE(r.clean_text, '') AS clean_text
        |FROM cnt c LEFT JOIN reb r ON c.doc_id = r.doc_id
        |ORDER BY c.doc_id""".stripMargin,
    // L74: the same segmentation, eval paragraphs anti-joined away
    "decontam_paragraph" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |  len(string_split(text, ' ')) AS n FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT doc_id, CAST(i AS INT) AS para_idx,
        |  array_to_string(list_slice(toks, CAST(i*20+1 AS INT), CAST(i*20+20 AS INT)), ' ') AS para_text
        | FROM t, UNNEST(range(0, CASE WHEN n <= 20 THEN 1 ELSE CAST(CEIL(n*1.0/20) AS INT) END)) AS u(i)),
        |tr AS (SELECT * FROM p WHERE doc_id % 10 <> 0),
        |ev AS (SELECT DISTINCT para_text FROM p WHERE doc_id % 10 = 0),
        |k AS (SELECT tr.doc_id, tr.para_idx, tr.para_text
        |      FROM tr LEFT JOIN ev ON tr.para_text = ev.para_text
        |      WHERE ev.para_text IS NULL),
        |reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  string_agg(para_text, ' ' ORDER BY para_idx) AS clean_text
        | FROM k GROUP BY doc_id),
        |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras FROM tr GROUP BY doc_id)
        |SELECT c.doc_id, c.n_paras, CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
        | COALESCE(r.clean_text, '') AS clean_text
        |FROM cnt c LEFT JOIN reb r ON c.doc_id = r.doc_id
        |ORDER BY c.doc_id""".stripMargin,
    // L76: the same gate definitions as the text_langid / text_quality /
    // text_repetition / dedup_exact oracles, re-labeled through the
    // verdict precedence (langCase is the SAME Scala val as text_langid's)
    "curation_verdicts" ->
      s"""WITH corpus AS (
         | SELECT doc_id, text, lang, source FROM documents
         | UNION ALL SELECT 2000000, NULL, 'en', 'synthetic'
         | UNION ALL SELECT 2000001, 'too short', 'en', 'synthetic'
         | UNION ALL SELECT 2000002, 'a a a a a a a a a a', 'en', 'synthetic'
         | UNION ALL SELECT doc_id + 1000000, text, lang, source
         |   FROM documents WHERE doc_id % 10 = 9),
         |q AS (
         | SELECT doc_id, lang, source, text,
         |  string_split(text, ' ') AS toks,
         |  len(string_split(text, ' ')) AS n_words,
         |  list_aggregate(list_transform(string_split(text, ' '), x -> len(x)), 'sum') AS sum_len,
         |  $langCase AS pred_lang
         | FROM corpus),
         |g AS (SELECT *,
         |  CASE WHEN n_words >= 2
         |   THEN [toks[i] || ' ' || toks[i+1] for i in range(1, n_words)]
         |   ELSE [] END AS g2,
         |  CASE WHEN n_words >= 3
         |   THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, n_words - 1)]
         |   ELSE [] END AS g3
         | FROM q),
         |m AS (SELECT doc_id, lang, source, text, n_words, pred_lang,
         |  ROUND(sum_len * 1.0 / n_words, 6) AS awl,
         |  CASE WHEN n_words > 0 THEN round(CAST(n_words - len(list_distinct(toks)) AS DOUBLE) / n_words, 6) END AS dw,
         |  CASE WHEN len(g2) > 0 THEN round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2), 6) END AS d2,
         |  CASE WHEN len(g3) > 0 THEN round(CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3), 6) END AS d3
         | FROM g),
         |w AS (SELECT md5(text) AS h, MIN(doc_id) AS keep FROM corpus
         |      WHERE text IS NOT NULL GROUP BY 1)
         |SELECT m.doc_id, m.source,
         | CASE WHEN m.text IS NULL OR m.n_words < 10 THEN 'empty'
         |  WHEN m.pred_lang <> m.lang THEN 'lang_mismatch'
         |  WHEN NOT (m.n_words >= 10 AND m.n_words <= 1000
         |            AND m.awl >= 2.0 AND m.awl <= 12.0) THEN 'low_quality'
         |  WHEN COALESCE(m.dw, 0) > 0.3 OR COALESCE(m.d2, 0) > 0.18
         |       OR COALESCE(m.d3, 0) > 0.12 THEN 'repetitive'
         |  WHEN m.doc_id <> w.keep THEN 'duplicate'
         |  ELSE 'keep' END AS verdict
         |FROM m LEFT JOIN w ON md5(m.text) = w.h
         |ORDER BY m.doc_id""".stripMargin,
    // L77: the card is the L76 verdict chain rolled up per source with
    // token inventories (HUGEINT sums cast to BIGINT — the r9 rule)
    "data_card" ->
      s"""WITH corpus AS (
         | SELECT doc_id, text, lang, source FROM documents
         | UNION ALL SELECT 2000000, NULL, 'en', 'synthetic'
         | UNION ALL SELECT 2000001, 'too short', 'en', 'synthetic'
         | UNION ALL SELECT 2000002, 'a a a a a a a a a a', 'en', 'synthetic'
         | UNION ALL SELECT doc_id + 1000000, text, lang, source
         |   FROM documents WHERE doc_id % 10 = 9),
         |q AS (
         | SELECT doc_id, lang, source, text,
         |  string_split(text, ' ') AS toks,
         |  len(string_split(text, ' ')) AS n_words,
         |  list_aggregate(list_transform(string_split(text, ' '), x -> len(x)), 'sum') AS sum_len,
         |  $langCase AS pred_lang
         | FROM corpus),
         |g AS (SELECT *,
         |  CASE WHEN n_words >= 2
         |   THEN [toks[i] || ' ' || toks[i+1] for i in range(1, n_words)]
         |   ELSE [] END AS g2,
         |  CASE WHEN n_words >= 3
         |   THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, n_words - 1)]
         |   ELSE [] END AS g3
         | FROM q),
         |m AS (SELECT doc_id, lang, source, text, n_words, pred_lang,
         |  ROUND(sum_len * 1.0 / n_words, 6) AS awl,
         |  CASE WHEN n_words > 0 THEN round(CAST(n_words - len(list_distinct(toks)) AS DOUBLE) / n_words, 6) END AS dw,
         |  CASE WHEN len(g2) > 0 THEN round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2), 6) END AS d2,
         |  CASE WHEN len(g3) > 0 THEN round(CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3), 6) END AS d3
         | FROM g),
         |w AS (SELECT md5(text) AS h, MIN(doc_id) AS keep FROM corpus
         |      WHERE text IS NOT NULL GROUP BY 1),
         |v AS (SELECT m.source,
         | CASE WHEN m.text IS NULL OR m.n_words < 10 THEN 'empty'
         |  WHEN m.pred_lang <> m.lang THEN 'lang_mismatch'
         |  WHEN NOT (m.n_words >= 10 AND m.n_words <= 1000
         |            AND m.awl >= 2.0 AND m.awl <= 12.0) THEN 'low_quality'
         |  WHEN COALESCE(m.dw, 0) > 0.3 OR COALESCE(m.d2, 0) > 0.18
         |       OR COALESCE(m.d3, 0) > 0.12 THEN 'repetitive'
         |  WHEN m.doc_id <> w.keep THEN 'duplicate'
         |  ELSE 'keep' END AS verdict,
         | CASE WHEN m.text IS NULL THEN 0 ELSE m.n_words END AS ntok
         |FROM m LEFT JOIN w ON md5(m.text) = w.h)
         |SELECT source,
         | CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(CASE WHEN verdict = 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         | CAST(SUM(CASE WHEN verdict = 'empty' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
         | CAST(SUM(CASE WHEN verdict = 'lang_mismatch' THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_mismatch,
         | CAST(SUM(CASE WHEN verdict = 'low_quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
         | CAST(SUM(CASE WHEN verdict = 'repetitive' THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
         | CAST(SUM(CASE WHEN verdict = 'duplicate' THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicate,
         | CAST(SUM(ntok) AS BIGINT) AS total_tokens,
         | CAST(SUM(CASE WHEN verdict = 'keep' THEN ntok ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM v GROUP BY source ORDER BY source""".stripMargin,
    // L75: the oracle replays the refresh arithmetic directly from the
    // source parquet — deletes, ACTUAL text changes (ntok > 20 only:
    // value-identical truncations drop out of the feed) and clone
    // inserts — and folds the same per-source deltas
    "corpus_drift" ->
      """WITH d AS (SELECT doc_id, source,
        |  CASE WHEN text IS NULL THEN 0 ELSE len(string_split(text, ' ')) END AS ntok
        | FROM documents),
        |legs AS (
        |  SELECT source, 0 AS a, 1 AS r, 0 AS c, -ntok AS td
        |    FROM d WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT source, 0, 0, 1, 20 - ntok
        |    FROM d WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0 AND ntok > 20
        |  UNION ALL
        |  SELECT source, 1, 0, 0, ntok FROM d WHERE doc_id % 11 = 0)
        |SELECT source,
        |  CAST(SUM(a) AS BIGINT) AS n_added,
        |  CAST(SUM(r) AS BIGINT) AS n_removed,
        |  CAST(SUM(c) AS BIGINT) AS n_changed,
        |  CAST(SUM(a) - SUM(r) AS BIGINT) AS doc_delta,
        |  CAST(SUM(td) AS BIGINT) AS tok_delta
        |FROM legs GROUP BY source ORDER BY source""".stripMargin,
    // dedup_despan: the L32 span CTEs extended with the token-level cut;
    // positions inside [s, e+7] drop, survivors rejoin in order
    "dedup_despan" ->
      """WITH t AS (
        | SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |w AS (
        | SELECT doc_id, i AS pos, md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS h
        | FROM t, UNNEST(generate_series(1, len(toks) - 7)) AS u(i)
        | WHERE len(toks) >= 8),
        |dup AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        |dpos AS (
        | SELECT w.doc_id, w.pos,
        |   CASE WHEN w.pos - lag(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos) <= 8
        |        THEN 0 ELSE 1 END AS brk
        | FROM w JOIN dup USING (h)),
        |isl AS (
        | SELECT doc_id, pos,
        |   SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM dpos),
        |spans AS (
        | SELECT doc_id, island, MIN(pos) AS s, MAX(pos) AS e
        | FROM isl GROUP BY doc_id, island),
        |tokens AS (
        | SELECT doc_id, i AS p, toks[i] AS tk
        | FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)),
        |rem AS (
        | SELECT DISTINCT tk.doc_id, tk.p
        | FROM tokens tk JOIN spans s ON tk.doc_id = s.doc_id
        |  AND tk.p BETWEEN s.s AND s.e + 7),
        |kept AS (
        | SELECT t2.doc_id, t2.p, t2.tk FROM tokens t2
        | LEFT JOIN rem ON t2.doc_id = rem.doc_id AND t2.p = rem.p
        | WHERE rem.p IS NULL)
        |SELECT t.doc_id, len(t.toks) AS n_tokens,
        | CAST(len(t.toks) - COUNT(k.p) AS BIGINT) AS removed_tokens,
        | COALESCE(string_agg(k.tk, ' ' ORDER BY k.p), '') AS clean_text
        |FROM t LEFT JOIN kept k USING (doc_id)
        |GROUP BY t.doc_id, len(t.toks) ORDER BY t.doc_id""".stripMargin,
    "dedup_substring" ->
      """WITH t AS (
        | SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |w AS (
        | SELECT doc_id, i AS pos, md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS h
        | FROM t, UNNEST(generate_series(1, len(toks) - 7)) AS u(i)
        | WHERE len(toks) >= 8),
        |dup AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        |dpos AS (
        | SELECT w.doc_id, w.pos,
        |   CASE WHEN w.pos - lag(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos) <= 8
        |        THEN 0 ELSE 1 END AS brk
        | FROM w JOIN dup USING (h)),
        |isl AS (
        | SELECT doc_id, pos,
        |   SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM dpos),
        |spans AS (
        | SELECT doc_id, island, MIN(pos) AS s, MAX(pos) AS e, COUNT(*) AS nw
        | FROM isl GROUP BY doc_id, island),
        |perdoc AS (
        | SELECT doc_id, COUNT(*) AS n_spans, CAST(SUM(nw) AS BIGINT) AS dup_windows,
        |   CAST(SUM(e - s + 8) AS BIGINT) AS dup_tokens
        | FROM spans GROUP BY doc_id)
        |SELECT t.doc_id, len(t.toks) AS n_tokens,
        |  GREATEST(len(t.toks) - 7, 0) AS n_windows,
        |  COALESCE(p.dup_windows, 0) AS dup_windows,
        |  COALESCE(p.n_spans, 0) AS n_spans,
        |  COALESCE(p.dup_tokens, 0) AS dup_tokens,
        |  ROUND(COALESCE(p.dup_tokens, 0) / len(t.toks), 6) AS dup_frac
        |FROM t LEFT JOIN perdoc p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "dedup_jaccard_adaptive" ->
      """WITH tok AS (
        | SELECT doc_id, lang, CAST(n_chars // 50 AS INT) AS band, string_split(text, ' ') AS toks
        | FROM documents),
        |sh AS (
        | SELECT DISTINCT doc_id, lang, band, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        | FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
        | WHERE len(toks) >= 3),
        |dfs AS (
        | SELECT doc_id, lang, band, s, COUNT(*) OVER (PARTITION BY lang, band, s) AS df FROM sh),
        |thr AS (
        | SELECT GREATEST(16.0, FLOOR(ROUND(quantile_cont(df, 0.999), 6))) AS t
        | FROM (SELECT DISTINCT lang, band, s, df FROM dfs)),
        |kept AS (SELECT dfs.* FROM dfs, thr WHERE df <= t),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        |pairs AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
        | GROUP BY a.doc_id, b.doc_id)
        |SELECT a_id, b_id, ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
        |FROM pairs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
        |WHERE ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.3
        |ORDER BY a_id, b_id""".stripMargin,
    // dedup_minhash_lsh, dedup_simhash: rows-only (engine-specific hash
    // seeds); asserted against exact twins in ScalaTest specs. The
    // PORTABLE twins below are the oracle-exact forms of L3/L4: same
    // signature/banding arithmetic, md5-derived hash ingredients.
    "dedup_minhash_portable" -> s"$minhashPortableBody\nORDER BY a_id, b_id",
    "dedup_simhash_portable" -> s"$simhashPortableBody\nORDER BY a_id, b_id",
    // L14b: all three families from the portable twins, one result —
    // the whole familiesPairs SURFACE (candidates, verification,
    // scores) under the oracle
    "dedup_families_portable" ->
      s"""SELECT 'jaccard' AS family, a_id, b_id, CAST(jaccard AS DOUBLE) AS score
         |FROM ($jaccardOracleBody)
         |UNION ALL
         |SELECT 'minhash' AS family, a_id, b_id, CAST(jaccard AS DOUBLE) AS score
         |FROM ($minhashPortableBody)
         |UNION ALL
         |SELECT 'simhash' AS family, a_id, b_id, CAST(64 - hamming AS DOUBLE) AS score
         |FROM ($simhashPortableBody)
         |ORDER BY family, a_id, b_id""".stripMargin,
    "dedup_containment" ->
      """WITH tok AS (
        | SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |sh AS (
        | SELECT DISTINCT doc_id, lang, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        | FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
        | WHERE len(toks) >= 3),
        |kept AS (
        | SELECT * FROM (
        |  SELECT doc_id, lang, s, COUNT(*) OVER (PARTITION BY lang, s) AS df FROM sh)
        | WHERE df <= 128),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        |prs AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
        | GROUP BY a.doc_id, b.doc_id)
        |SELECT a_id, b_id, ROUND(inter * 1.0 / LEAST(sa.n, sb.n), 6) AS containment
        |FROM prs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
        |WHERE ROUND(inter * 1.0 / LEAST(sa.n, sb.n), 6) >= 0.6
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_cross" ->
      """WITH tok AS (
        | SELECT doc_id, lang, CAST(n_chars // 50 AS INT) AS band, string_split(text, ' ') AS toks
        | FROM documents),
        |sh AS (
        | SELECT DISTINCT doc_id, lang, band, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        | FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
        | WHERE len(toks) >= 3),
        |kept AS (
        | SELECT * FROM (
        |  SELECT doc_id, lang, band, s, COUNT(*) OVER (PARTITION BY lang, band, s) AS df FROM sh)
        | WHERE df <= 128),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        |prs AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.lang = b.lang AND a.band = b.band
        | WHERE a.doc_id % 7 <> 0 AND b.doc_id % 7 = 0
        | GROUP BY a.doc_id, b.doc_id)
        |SELECT a_id, b_id, ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
        |FROM prs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
        |WHERE ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.3
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_clusters" -> clustersOracle,
    // L16b/L16c compute the SAME labeling (alternating-star schedule /
    // incremental delta fold), so they share the oracle verbatim
    "dedup_clusters_minlabel" -> clustersOracle,
    "dedup_clusters_incr" -> clustersOracle,
    "contamination_check" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |tr AS (
        | SELECT DISTINCT toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4] AS s
        | FROM tok, UNNEST(range(1, len(toks)-3)) u(i) WHERE len(toks)>=5 AND doc_id % 10 <> 0),
        |ev AS (
        | SELECT DISTINCT doc_id, toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4] AS s
        | FROM tok, UNNEST(range(1, len(toks)-3)) u(i) WHERE len(toks)>=5 AND doc_id % 10 = 0),
        |tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM ev GROUP BY doc_id),
        |hit AS (SELECT doc_id, COUNT(*) AS n_contaminated FROM ev
        |        WHERE EXISTS(SELECT 1 FROM tr WHERE tr.s = ev.s) GROUP BY doc_id)
        |SELECT t.doc_id, t.n_shingles, COALESCE(h.n_contaminated, 0) AS n_contaminated,
        | ROUND(COALESCE(h.n_contaminated,0) * 1.0 / t.n_shingles, 6) AS contamination,
        | (ROUND(COALESCE(h.n_contaminated,0) * 1.0 / t.n_shingles, 6) >= 0.2) AS flagged
        |FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id ORDER BY t.doc_id""".stripMargin,
    // L70: same-label best-match argmax with the 6-dp cosine idiom;
    // ties broken by train id, NULL-match evals report clean.
    "contamination_semantic" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |ev AS (SELECT * FROM e WHERE vec_id % 5 = 0),
        |tr AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
        |cand AS (SELECT ev.vec_id AS eval_id, tr.vec_id AS train_id,
        |  ROUND(list_inner_product(ev.v, tr.v) /
        |    (sqrt(list_inner_product(ev.v, ev.v)) * sqrt(list_inner_product(tr.v, tr.v))), 6) AS c
        | FROM ev JOIN tr ON ev.label = tr.label),
        |best AS (SELECT eval_id, train_id, c,
        |  ROW_NUMBER() OVER (PARTITION BY eval_id ORDER BY c DESC, train_id) AS rn FROM cand)
        |SELECT ev.vec_id AS eval_id, b.train_id AS best_train, b.c AS best_cosine,
        | COALESCE(b.c >= 0.35, FALSE) AS contaminated
        |FROM ev LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON ev.vec_id = b.eval_id
        |ORDER BY eval_id""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | ROUND(list_inner_product(a.v, b.v) /
        |   (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6) AS cosine
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ROUND(list_inner_product(a.v, b.v) /
        |   (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6) >= 0.35
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_semantic" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ei AS (SELECT vec_id, v,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * 1048576) AS BIGINT) AS DOUBLE)) AS vi
        | FROM e),
        |sr AS (SELECT vi,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM ei),
        |sd AS (SELECT cl, vi FROM sr WHERE cl < 8),
        |dist AS (
        | SELECT e.vec_id, s.cl,
        |  list_inner_product(e.vi, e.vi) + list_inner_product(s.vi, s.vi)
        |   - 2 * list_inner_product(e.vi, s.vi) AS d
        | FROM ei e CROSS JOIN sd s),
        |da AS (SELECT vec_id, cl, d,
        |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM dist),
        |av AS (SELECT a.vec_id, a.cl, a.d, e.v
        |  FROM (SELECT vec_id, cl, d FROM da WHERE rn = 1) a JOIN e USING (vec_id)),
        |dropped AS (
        | SELECT DISTINCT a.vec_id
        | FROM av a JOIN av b ON a.cl = b.cl AND a.vec_id <> b.vec_id
        | WHERE ROUND(list_inner_product(a.v, b.v) /
        |    (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6) >= 0.3
        |  AND (b.d > a.d OR (b.d = a.d AND b.vec_id < a.vec_id)))
        |SELECT av.vec_id, av.cl, (dr.vec_id IS NULL) AS kept
        |FROM av LEFT JOIN dropped dr ON av.vec_id = dr.vec_id
        |ORDER BY av.vec_id""".stripMargin,
    "embedding_centroids" ->
      """WITH agg AS (
        | SELECT label, CAST(i AS INT) AS pos, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(embedding[i+1]::DOUBLE, 6) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS s
        | FROM embeddings, UNNEST(range(0, len(embedding))) u(i)
        | GROUP BY label, i)
        |SELECT label, pos, n,
        | CAST(CASE WHEN s < 0 THEN -((2 * (-s) + n) // (2 * n))
        |           ELSE (2 * s + n) // (2 * n) END AS DOUBLE) / 1000000.0 AS centroid
        |FROM agg ORDER BY label, pos""".stripMargin,
    "sim_topk_bruteforce" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS vq FROM e WHERE vec_id % 50 = 0),
        |scored AS (
        | SELECT q.q_id, e.vec_id AS n_id,
        |  ROUND(list_inner_product(q.vq, e.v) /
        |    (sqrt(list_inner_product(q.vq, q.vq)) * sqrt(list_inner_product(e.v, e.v))), 6) AS cosine
        | FROM q JOIN e ON e.vec_id <> q.q_id),
        |ranked AS (
        | SELECT q_id, n_id, cosine,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
        | FROM scored)
        |SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // sim_topk_lsh: rows-only (bucket recall is data-dependent); its
    // portable twin below is the hash-verified form of the same family.
    "sim_topk_lsh_portable" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sgn AS (
        | SELECT j, i,
        |  CASE WHEN (strpos('0123456789abcdef', substr(md5(j || ',' || i), 1, 1)) - 1) % 2 = 1
        |       THEN 1 ELSE -1 END AS s
        | FROM range(0, 4) t(j), range(0, 64) u(i)),
        |scores AS (
        | SELECT e.vec_id, g.j,
        |  SUM(g.s * CAST(FLOOR(e.v[g.i + 1] * 1048576) AS BIGINT)) AS sc
        | FROM e, sgn g GROUP BY e.vec_id, g.j),
        |bk AS (
        | SELECT vec_id, SUM(CASE WHEN sc >= 0 THEN CAST(POW(2, j) AS BIGINT) ELSE 0 END) AS bk
        | FROM scores GROUP BY vec_id),
        |q AS (
        | SELECT e.vec_id AS q_id, e.v AS vq, p.pb
        | FROM e JOIN bk ON e.vec_id = bk.vec_id,
        |  UNNEST([bk.bk, xor(bk.bk, 1), xor(bk.bk, 2), xor(bk.bk, 4), xor(bk.bk, 8)]) p(pb)
        | WHERE e.vec_id % 50 = 0),
        |scored AS (
        | SELECT q.q_id, e.vec_id AS n_id,
        |  ROUND(list_inner_product(q.vq, e.v) /
        |    (sqrt(list_inner_product(q.vq, q.vq)) * sqrt(list_inner_product(e.v, e.v))), 6) AS cosine
        | FROM q JOIN bk cb ON cb.bk = q.pb JOIN e ON e.vec_id = cb.vec_id
        | WHERE e.vec_id <> q.q_id),
        |ranked AS (
        | SELECT q_id, n_id, cosine,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
        | FROM scored)
        |SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // sim_topk_ivf: rows-only (Lloyd-trained quantizer isn't
    // ANSI-expressible); the portable twin below is the hash-verified
    // form of the same assign/probe/rerank family.
    // sim_topk_ivf_indexed: the PERSISTED portable index — seeds are
    // the 16 smallest-(md5, id) vectors of the SAVE corpus (vec_id%5<>0
    // — the grown 20% never re-seeds, the faiss add() contract), all
    // vectors assigned under them, probe + exact-cosine rerank.
    "sim_topk_ivf_indexed" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ei AS (SELECT vec_id,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * 1048576) AS BIGINT) AS DOUBLE)) AS vi
        | FROM e),
        |sr AS (SELECT vi,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM ei WHERE vec_id % 5 <> 0),
        |sd AS (SELECT cl, vi FROM sr WHERE cl < 16),
        |dist AS (
        | SELECT e.vec_id, s.cl,
        |  list_inner_product(e.vi, e.vi) + list_inner_product(s.vi, s.vi)
        |   - 2 * list_inner_product(e.vi, s.vi) AS d
        | FROM ei e CROSS JOIN sd s),
        |da AS (SELECT vec_id, cl,
        |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM dist),
        |assign AS (SELECT vec_id, cl FROM da WHERE rn = 1),
        |probes AS (SELECT vec_id AS q_id, cl FROM da WHERE vec_id % 50 = 0 AND rn <= 4),
        |scored AS (
        | SELECT p.q_id, a.vec_id AS n_id,
        |  ROUND(list_inner_product(q.v, e.v) /
        |    (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(e.v, e.v))), 6) AS cosine
        | FROM probes p JOIN assign a ON a.cl = p.cl
        |  JOIN e q ON q.vec_id = p.q_id JOIN e ON e.vec_id = a.vec_id
        | WHERE a.vec_id <> p.q_id),
        |ranked AS (
        | SELECT q_id, n_id, cosine,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
        | FROM scored)
        |SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // sim_topk_ivfpq_indexed: the PERSISTED portable IVF-PQ index —
    // coarse seeds (16) and sub-codebook seeds (8) both hash-sampled
    // from the save corpus, codes + coarse lists for ALL vectors,
    // nProbe=4 coarse pruning, exact long ADC over the stored codes.
    "sim_topk_ivfpq_indexed" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ei AS (SELECT vec_id,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * 1048576) AS BIGINT) AS DOUBLE)) AS vi
        | FROM e),
        |csr AS (SELECT vi,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM ei WHERE vec_id % 5 <> 0),
        |cs AS (SELECT cl, vi FROM csr WHERE cl < 16),
        |cdist AS (
        | SELECT e.vec_id, s.cl,
        |  list_inner_product(e.vi, e.vi) + list_inner_product(s.vi, s.vi)
        |   - 2 * list_inner_product(e.vi, s.vi) AS d
        | FROM ei e CROSS JOIN cs s),
        |cda AS (SELECT vec_id, cl,
        |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM cdist),
        |cassign AS (SELECT vec_id, cl FROM cda WHERE rn = 1),
        |cprobes AS (SELECT vec_id AS q_id, cl FROM cda WHERE vec_id % 50 = 0 AND rn <= 4),
        |sub AS (SELECT CAST(j AS INT) AS j FROM range(0, 4) t(j)),
        |sv AS (SELECT vec_id, j, list_slice(vi, j*16+1, j*16+16) AS svi
        | FROM ei CROSS JOIN sub),
        |sr AS (SELECT vec_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM e WHERE vec_id % 5 <> 0),
        |seeds AS (SELECT r.cl, s.j, s.svi FROM sr r JOIN sv s USING (vec_id) WHERE r.cl < 8),
        |dist AS (
        | SELECT c.vec_id, c.j, s.cl,
        |  list_inner_product(c.svi, c.svi) + list_inner_product(s.svi, s.svi)
        |   - 2 * list_inner_product(c.svi, s.svi) AS d
        | FROM sv c JOIN seeds s ON c.j = s.j),
        |codes AS (SELECT vec_id, j, cl FROM (
        |  SELECT vec_id, j, cl, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, cl) AS rn
        |  FROM dist) WHERE rn = 1),
        |qd AS (SELECT vec_id AS q_id, j, cl, d FROM dist WHERE vec_id % 50 = 0),
        |scored AS (
        | SELECT q.q_id, c.vec_id AS n_id, CAST(SUM(q.d) AS BIGINT) AS adc
        | FROM codes c
        | JOIN cassign ca ON ca.vec_id = c.vec_id
        | JOIN cprobes p ON p.cl = ca.cl
        | JOIN qd q ON q.q_id = p.q_id AND q.j = c.j AND q.cl = c.cl
        | WHERE c.vec_id <> q.q_id GROUP BY 1, 2),
        |ranked AS (SELECT q_id, n_id, adc,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS INT) AS rank
        | FROM scored)
        |SELECT q_id, n_id, rank, adc FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    "sim_topk_ivf_portable" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ei AS (SELECT vec_id,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * 1048576) AS BIGINT) AS DOUBLE)) AS vi
        | FROM e),
        |sr AS (SELECT vi,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM ei),
        |sd AS (SELECT cl, vi FROM sr WHERE cl < 16),
        |dist AS (
        | SELECT e.vec_id, s.cl,
        |  list_inner_product(e.vi, e.vi) + list_inner_product(s.vi, s.vi)
        |   - 2 * list_inner_product(e.vi, s.vi) AS d
        | FROM ei e CROSS JOIN sd s),
        |da AS (SELECT vec_id, cl,
        |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM dist),
        |assign AS (SELECT vec_id, cl FROM da WHERE rn = 1),
        |probes AS (SELECT vec_id AS q_id, cl FROM da WHERE vec_id % 50 = 0 AND rn <= 4),
        |scored AS (
        | SELECT p.q_id, a.vec_id AS n_id,
        |  ROUND(list_inner_product(q.v, e.v) /
        |    (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(e.v, e.v))), 6) AS cosine
        | FROM probes p JOIN assign a ON a.cl = p.cl
        |  JOIN e q ON q.vec_id = p.q_id JOIN e ON e.vec_id = a.vec_id
        | WHERE a.vec_id <> p.q_id),
        |ranked AS (
        | SELECT q_id, n_id, cosine,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
        | FROM scored)
        |SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // sim_index_stats: per-cell list sizes under the portable
    // assignment (same assign CTEs), empty cells via range(0,16);
    // share/balance are exact BIGINT floor divisions
    "sim_index_stats" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ei AS (SELECT vec_id,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * 1048576) AS BIGINT) AS DOUBLE)) AS vi
        | FROM e),
        |sr AS (SELECT vi,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM ei),
        |sd AS (SELECT cl, vi FROM sr WHERE cl < 16),
        |dist AS (
        | SELECT e.vec_id, s.cl,
        |  list_inner_product(e.vi, e.vi) + list_inner_product(s.vi, s.vi)
        |   - 2 * list_inner_product(e.vi, s.vi) AS d
        | FROM ei e CROSS JOIN sd s),
        |da AS (SELECT vec_id, cl,
        |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM dist),
        |assign AS (SELECT vec_id, cl FROM da WHERE rn = 1),
        |l AS (SELECT cl, CAST(COUNT(*) AS BIGINT) AS n_vectors FROM assign GROUP BY cl),
        |tt AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS tot FROM l)
        |SELECT CAST(r.range AS INT) AS cl,
        | CAST(COALESCE(l.n_vectors, 0) AS BIGINT) AS n_vectors,
        | (CAST(COALESCE(l.n_vectors, 0) AS BIGINT) * 1000000) // tt.tot AS share_micros,
        | (CAST(COALESCE(l.n_vectors, 0) AS BIGINT) * 16000000) // tt.tot AS balance_micros
        |FROM range(0, 16) r CROSS JOIN tt LEFT JOIN l ON l.cl = r.range
        |ORDER BY cl""".stripMargin,
    // sim_cluster_quality: the same assign CTEs keeping the exact
    // integer distance; sum in HUGEINT, BIGINT-safe mean/max emitted
    "sim_cluster_quality" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ei AS (SELECT vec_id,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * 1048576) AS BIGINT) AS DOUBLE)) AS vi
        | FROM e),
        |sr AS (SELECT vi,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM ei),
        |sd AS (SELECT cl, vi FROM sr WHERE cl < 16),
        |dist AS (
        | SELECT e.vec_id, s.cl,
        |  list_inner_product(e.vi, e.vi) + list_inner_product(s.vi, s.vi)
        |   - 2 * list_inner_product(e.vi, s.vi) AS d
        | FROM ei e CROSS JOIN sd s),
        |da AS (SELECT vec_id, cl, d,
        |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM dist),
        |a AS (SELECT vec_id, cl, CAST(d AS BIGINT) AS dc FROM da WHERE rn = 1)
        |SELECT cl, CAST(COUNT(*) AS BIGINT) AS n_vectors,
        | CAST(CAST(SUM(dc) AS HUGEINT) // COUNT(*) AS BIGINT) AS mean_sse,
        | CAST(MAX(dc) AS BIGINT) AS max_sse
        |FROM a GROUP BY cl ORDER BY cl""".stripMargin,
    // text_detokenize: the oracle states the round-trip CONTRACT — the
    // engine's vocab-lookup decode must equal the space-stripped
    // source text with ok = true everywhere; any decode defect
    // hash-mismatches both columns
    "text_detokenize" ->
      """SELECT doc_id, replace(text, ' ', '') AS decoded_text,
        | true AS round_trip_ok
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,
    // sim_recall: recall@k of the portable IVF path against brute-force
    // ground truth — the truth CTEs are sim_topk_bruteforce's, the
    // approx CTEs sim_topk_ivf_portable's, joined on (q_id, n_id);
    // recall is the exact integer floor(hits·10⁶ / k_truth)
    "sim_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS vq FROM e WHERE vec_id % 50 = 0),
        |ts AS (
        | SELECT q.q_id, e.vec_id AS n_id,
        |  ROUND(list_inner_product(q.vq, e.v) /
        |    (sqrt(list_inner_product(q.vq, q.vq)) * sqrt(list_inner_product(e.v, e.v))), 6) AS cosine
        | FROM q JOIN e ON e.vec_id <> q.q_id),
        |truth AS (SELECT q_id, n_id FROM (
        |  SELECT q_id, n_id,
        |   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank FROM ts)
        | WHERE rank <= 5),
        |ei AS (SELECT vec_id,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * 1048576) AS BIGINT) AS DOUBLE)) AS vi
        | FROM e),
        |sr AS (SELECT vi,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM ei),
        |sd AS (SELECT cl, vi FROM sr WHERE cl < 16),
        |dist AS (
        | SELECT e.vec_id, s.cl,
        |  list_inner_product(e.vi, e.vi) + list_inner_product(s.vi, s.vi)
        |   - 2 * list_inner_product(e.vi, s.vi) AS d
        | FROM ei e CROSS JOIN sd s),
        |da AS (SELECT vec_id, cl,
        |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM dist),
        |assign AS (SELECT vec_id, cl FROM da WHERE rn = 1),
        |probes AS (SELECT vec_id AS q_id, cl FROM da WHERE vec_id % 50 = 0 AND rn <= 4),
        |ascored AS (
        | SELECT p.q_id, a.vec_id AS n_id,
        |  ROUND(list_inner_product(q.v, e.v) /
        |    (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(e.v, e.v))), 6) AS cosine
        | FROM probes p JOIN assign a ON a.cl = p.cl
        |  JOIN e q ON q.vec_id = p.q_id JOIN e ON e.vec_id = a.vec_id
        | WHERE a.vec_id <> p.q_id),
        |approx AS (SELECT q_id, n_id FROM (
        |  SELECT q_id, n_id,
        |   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank FROM ascored)
        | WHERE rank <= 5)
        |SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS k_truth,
        | CAST(SUM(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_hit,
        | (CAST(SUM(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |   // CAST(COUNT(*) AS BIGINT) AS recall_micros
        |FROM truth t LEFT JOIN approx a ON t.q_id = a.q_id AND t.n_id = a.n_id
        |GROUP BY t.q_id ORDER BY t.q_id""".stripMargin,
    // sim_recall_pq: brute-force truth CTEs + the PQ code/ADC CTEs
    // (sim_topk_pq_portable's), joined on (q_id, n_id)
    "sim_recall_pq" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS vq FROM e WHERE vec_id % 50 = 0),
        |ts AS (
        | SELECT q.q_id, e.vec_id AS n_id,
        |  ROUND(list_inner_product(q.vq, e.v) /
        |    (sqrt(list_inner_product(q.vq, q.vq)) * sqrt(list_inner_product(e.v, e.v))), 6) AS cosine
        | FROM q JOIN e ON e.vec_id <> q.q_id),
        |truth AS (SELECT q_id, n_id FROM (
        |  SELECT q_id, n_id,
        |   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank FROM ts)
        | WHERE rank <= 5),
        |ei AS (SELECT vec_id,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * 1048576) AS BIGINT) AS DOUBLE)) AS vi
        | FROM e),
        |sub AS (SELECT CAST(j AS INT) AS j FROM range(0, 4) t(j)),
        |sv AS (SELECT vec_id, j, list_slice(vi, j*16+1, j*16+16) AS svi
        | FROM ei CROSS JOIN sub),
        |sr AS (SELECT vec_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM e),
        |seeds AS (SELECT r.cl, s.j, s.svi FROM sr r JOIN sv s USING (vec_id) WHERE r.cl < 8),
        |dist AS (
        | SELECT c.vec_id, c.j, s.cl,
        |  list_inner_product(c.svi, c.svi) + list_inner_product(s.svi, s.svi)
        |   - 2 * list_inner_product(c.svi, s.svi) AS d
        | FROM sv c JOIN seeds s ON c.j = s.j),
        |codes AS (SELECT vec_id, j, cl FROM (
        |  SELECT vec_id, j, cl, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, cl) AS rn
        |  FROM dist) WHERE rn = 1),
        |qd AS (SELECT vec_id AS q_id, j, cl, d FROM dist WHERE vec_id % 50 = 0),
        |ascored AS (
        | SELECT q.q_id, c.vec_id AS n_id, CAST(SUM(q.d) AS BIGINT) AS adc
        | FROM codes c JOIN qd q ON q.j = c.j AND q.cl = c.cl
        | WHERE c.vec_id <> q.q_id GROUP BY 1, 2),
        |approx AS (SELECT q_id, n_id FROM (
        |  SELECT q_id, n_id,
        |   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rank FROM ascored)
        | WHERE rank <= 5)
        |SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS k_truth,
        | CAST(SUM(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_hit,
        | (CAST(SUM(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |   // CAST(COUNT(*) AS BIGINT) AS recall_micros
        |FROM truth t LEFT JOIN approx a ON t.q_id = a.q_id AND t.n_id = a.n_id
        |GROUP BY t.q_id ORDER BY t.q_id""".stripMargin,
    // sim_kmeans_train: Ann.kmeansTrain's two Lloyd iterations unrolled —
    // hash-sampled integer seeds, exact integer distances/argmin (ties to
    // the smaller cl), per-(cl,pos) integer sums, half-away integer-micros
    // division in the 2^20 scale, empty clusters carrying their previous
    // centroid; the output centroid is the exact power-of-two division.
    "sim_kmeans_train" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ei AS (SELECT vec_id,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * 1048576) AS BIGINT) AS DOUBLE)) AS vi
        | FROM e),
        |sr AS (SELECT vi,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM ei),
        |c0 AS (SELECT cl, vi FROM sr WHERE cl < 8),
        |d1 AS (SELECT e.vec_id, c.cl,
        |  list_inner_product(e.vi, e.vi) + list_inner_product(c.vi, c.vi)
        |   - 2 * list_inner_product(e.vi, c.vi) AS d
        | FROM ei e CROSS JOIN c0 c),
        |a1 AS (SELECT vec_id, cl FROM (
        |  SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
        |  FROM d1) WHERE rn = 1),
        |s1 AS (SELECT a.cl, CAST(u.i AS INT) AS pos,
        |  SUM(CAST(e.vi[u.i + 1] AS BIGINT)) AS s, COUNT(*) AS n
        | FROM a1 a JOIN ei e USING (vec_id), UNNEST(generate_series(0, 63)) u(i)
        | GROUP BY a.cl, u.i),
        |m1 AS (SELECT cl, pos,
        |  CASE WHEN s < 0 THEN -((2 * (-s) + n) // (2 * n))
        |       ELSE (2 * s + n) // (2 * n) END AS c
        | FROM s1),
        |c1 AS (SELECT c0.cl, COALESCE(u.vi, c0.vi) AS vi
        | FROM c0 LEFT JOIN (
        |   SELECT cl, list(CAST(c AS DOUBLE) ORDER BY pos) AS vi FROM m1 GROUP BY cl) u
        |  ON u.cl = c0.cl),
        |d2 AS (SELECT e.vec_id, c.cl,
        |  list_inner_product(e.vi, e.vi) + list_inner_product(c.vi, c.vi)
        |   - 2 * list_inner_product(e.vi, c.vi) AS d
        | FROM ei e CROSS JOIN c1 c),
        |a2 AS (SELECT vec_id, cl FROM (
        |  SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
        |  FROM d2) WHERE rn = 1),
        |s2 AS (SELECT a.cl, CAST(u.i AS INT) AS pos,
        |  SUM(CAST(e.vi[u.i + 1] AS BIGINT)) AS s, COUNT(*) AS n
        | FROM a2 a JOIN ei e USING (vec_id), UNNEST(generate_series(0, 63)) u(i)
        | GROUP BY a.cl, u.i),
        |m2 AS (SELECT cl, pos, n,
        |  CASE WHEN s < 0 THEN -((2 * (-s) + n) // (2 * n))
        |       ELSE (2 * s + n) // (2 * n) END AS c
        | FROM s2)
        |SELECT cl, pos, n, CAST(c AS DOUBLE) / 1048576.0 AS centroid
        |FROM m2 ORDER BY cl, pos""".stripMargin,
    // sim_topk_pq_portable mirrors Ann.topKPqPortable end-to-end:
    // hash-sampled sub-codebooks (ksub=8 smallest (md5, id) rows, m=4
    // subspaces of 16 dims), integer distances over floor(x·2^20), exact
    // long ADC sums, (adc asc, n_id) rank. Every value integer-exact in
    // both engines.
    "sim_topk_pq_portable" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ei AS (SELECT vec_id,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * 1048576) AS BIGINT) AS DOUBLE)) AS vi
        | FROM e),
        |sub AS (SELECT CAST(j AS INT) AS j FROM range(0, 4) t(j)),
        |sv AS (SELECT vec_id, j, list_slice(vi, j*16+1, j*16+16) AS svi
        | FROM ei CROSS JOIN sub),
        |sr AS (SELECT vec_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM e),
        |seeds AS (SELECT r.cl, s.j, s.svi FROM sr r JOIN sv s USING (vec_id) WHERE r.cl < 8),
        |dist AS (
        | SELECT c.vec_id, c.j, s.cl,
        |  list_inner_product(c.svi, c.svi) + list_inner_product(s.svi, s.svi)
        |   - 2 * list_inner_product(c.svi, s.svi) AS d
        | FROM sv c JOIN seeds s ON c.j = s.j),
        |codes AS (SELECT vec_id, j, cl FROM (
        |  SELECT vec_id, j, cl, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, cl) AS rn
        |  FROM dist) WHERE rn = 1),
        |qd AS (SELECT vec_id AS q_id, j, cl, d FROM dist WHERE vec_id % 50 = 0),
        |scored AS (
        | SELECT q.q_id, c.vec_id AS n_id, CAST(SUM(q.d) AS BIGINT) AS adc
        | FROM codes c JOIN qd q ON q.j = c.j AND q.cl = c.cl
        | WHERE c.vec_id <> q.q_id GROUP BY 1, 2),
        |ranked AS (SELECT q_id, n_id, adc,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS INT) AS rank
        | FROM scored)
        |SELECT q_id, n_id, rank, adc FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id, lang, $langCase AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH q AS (
        | SELECT doc_id, string_split(text, ' ') AS toks,
        |  len(string_split(text, ' ')) AS n_words,
        |  list_aggregate(list_transform(string_split(text, ' '), x -> len(x)), 'sum') AS sum_len,
        |  len(list_filter(string_split(text, ' '),
        |      x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS stop_hits
        | FROM documents)
        |SELECT doc_id, CAST(n_words AS INT) AS n_words,
        | ROUND(sum_len * 1.0 / n_words, 6) AS avg_word_len,
        | ROUND(stop_hits * 1.0 / n_words, 6) AS stopword_ratio,
        | (n_words >= 10 AND n_words <= 1000
        |  AND ROUND(sum_len * 1.0 / n_words, 6) >= 2.0
        |  AND ROUND(sum_len * 1.0 / n_words, 6) <= 12.0) AS quality
        |FROM q ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_clean" ->
      """SELECT doc_id,
        | lower(trim(regexp_replace(
        |   regexp_replace(
        |     regexp_replace(text, 'https?://[^ ]+', '<url>', 'g'),
        |     '[^ ]+@[^ ]+\.[^ ]+', '<email>', 'g'),
        |   '  +', ' ', 'g'))) AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH d AS (
        | SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        | SELECT doc_id, toks, len(toks) AS n,
        |  CASE WHEN len(toks) >= 2
        |   THEN [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
        |   ELSE [] END AS g2,
        |  CASE WHEN len(toks) >= 3
        |   THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)]
        |   ELSE [] END AS g3
        | FROM d),
        |m AS (
        | SELECT doc_id, n AS n_tokens,
        |  CASE WHEN n > 0 THEN round(CAST(n - len(list_distinct(toks)) AS DOUBLE) / n, 6) END AS dup_word_frac,
        |  CASE WHEN len(g2) > 0 THEN round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2), 6) END AS dup_2gram_frac,
        |  CASE WHEN len(g3) > 0 THEN round(CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3), 6) END AS dup_3gram_frac
        | FROM g)
        |SELECT doc_id, n_tokens, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
        | (COALESCE(dup_word_frac, 0) > 0.3 OR COALESCE(dup_2gram_frac, 0) > 0.18
        |   OR COALESCE(dup_3gram_frac, 0) > 0.12) AS repetitive
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_pii" ->
      """WITH p AS (
        | SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        | FROM documents)
        |SELECT doc_id,
        | len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+')) AS n_emails,
        | len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4}')) AS n_phones,
        | regexp_replace(regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+', '<email>', 'g'),
        |   '[0-9]{3}-[0-9]{4}', '<phone>', 'g') AS redacted
        |FROM p ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(0::BIGINT,
        |   list_transform(regexp_split_to_array(text, ''), x -> ord(x)::BIGINT)),
        |   (h, c) -> (h * 257 + c) % 2147483647) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, sample_rank FROM (
        | SELECT doc_id, lang,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS sample_rank
        | FROM documents)
        |WHERE sample_rank <= 30 ORDER BY lang, sample_rank""".stripMargin,
    "sample_diverse" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ei AS (SELECT vec_id,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * 1048576) AS BIGINT) AS DOUBLE)) AS vi
        | FROM e),
        |sr AS (SELECT vi,
        |  CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cl
        | FROM ei),
        |sd AS (SELECT cl, vi FROM sr WHERE cl < 8),
        |dist AS (
        | SELECT e.vec_id, s.cl,
        |  list_inner_product(e.vi, e.vi) + list_inner_product(s.vi, s.vi)
        |   - 2 * list_inner_product(e.vi, s.vi) AS d
        | FROM ei e CROSS JOIN sd s),
        |da AS (SELECT vec_id, cl,
        |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn FROM dist),
        |assign AS (SELECT vec_id, cl FROM da WHERE rn = 1)
        |SELECT vec_id, cl, sample_rank FROM (
        | SELECT vec_id, cl,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY cl
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) AS sample_rank
        | FROM assign)
        |WHERE sample_rank <= 12 ORDER BY cl, sample_rank""".stripMargin,
    "sample_weighted" ->
      """WITH src AS (SELECT doc_id, lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |keyed AS (SELECT doc_id, lang, n_chars,
        | ROUND(ln((
        |   (strpos('0123456789abcdef', substr(h,1,1))-1)*268435456.0
        | + (strpos('0123456789abcdef', substr(h,2,1))-1)*16777216.0
        | + (strpos('0123456789abcdef', substr(h,3,1))-1)*1048576.0
        | + (strpos('0123456789abcdef', substr(h,4,1))-1)*65536.0
        | + (strpos('0123456789abcdef', substr(h,5,1))-1)*4096.0
        | + (strpos('0123456789abcdef', substr(h,6,1))-1)*256.0
        | + (strpos('0123456789abcdef', substr(h,7,1))-1)*16.0
        | + (strpos('0123456789abcdef', substr(h,8,1))-1)
        | + 0.5) / 4294967296.0) / CAST(GREATEST(n_chars, 1) AS DOUBLE), 9) AS key
        | FROM src)
        |SELECT lang, doc_id, n_chars, sample_rank FROM (
        | SELECT lang, doc_id, n_chars,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) AS INT) AS sample_rank
        | FROM keyed)
        |WHERE sample_rank <= 5 ORDER BY lang, sample_rank""".stripMargin,
    // pack_nosplit: the greedy no-split recurrence as a linear
    // recursive CTE per (lang, shard) cell — anchor rn=1 at (bin 0,
    // off 0); each step's candidate offset is the previous end
    "pack_nosplit" ->
      """WITH RECURSIVE d AS (
        | SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
        |        md5(CAST(doc_id AS VARCHAR)) AS h
        | FROM documents),
        |v AS (
        | SELECT doc_id, lang, n_tokens, h,
        |  CAST((strpos('0123456789abcdef', substr(h,1,1))-1)*268435456.0
        |   + (strpos('0123456789abcdef', substr(h,2,1))-1)*16777216.0
        |   + (strpos('0123456789abcdef', substr(h,3,1))-1)*1048576.0
        |   + (strpos('0123456789abcdef', substr(h,4,1))-1)*65536.0
        |   + (strpos('0123456789abcdef', substr(h,5,1))-1)*4096.0
        |   + (strpos('0123456789abcdef', substr(h,6,1))-1)*256.0
        |   + (strpos('0123456789abcdef', substr(h,7,1))-1)*16.0
        |   + (strpos('0123456789abcdef', substr(h,8,1))-1) AS BIGINT) % 8 AS pack_shard
        | FROM d),
        |r AS (SELECT lang, pack_shard, doc_id, n_tokens,
        |  ROW_NUMBER() OVER (PARTITION BY lang, pack_shard ORDER BY h, doc_id) AS rn FROM v),
        |f AS (
        | SELECT lang, pack_shard, doc_id, n_tokens, rn,
        |  CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS off
        | FROM r WHERE rn = 1
        | UNION ALL
        | SELECT r.lang, r.pack_shard, r.doc_id, r.n_tokens, r.rn,
        |  CASE WHEN f.off + f.n_tokens + r.n_tokens <= 48 THEN f.bin ELSE f.bin + 1 END,
        |  CASE WHEN f.off + f.n_tokens + r.n_tokens <= 48 THEN f.off + f.n_tokens
        |       ELSE CAST(0 AS BIGINT) END
        | FROM f JOIN r ON r.lang = f.lang AND r.pack_shard = f.pack_shard AND r.rn = f.rn + 1)
        |SELECT lang, CAST(pack_shard AS BIGINT) AS pack_shard, doc_id,
        | CAST(n_tokens AS BIGINT) AS n_tokens, bin AS bin_seq, off AS start_off,
        | n_tokens > 48 AS overflow
        |FROM f ORDER BY lang, pack_shard, bin_seq, start_off, doc_id""".stripMargin,
    "pack_sequences" ->
      """WITH d AS (
        | SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
        |        md5(CAST(doc_id AS VARCHAR)) AS h
        | FROM documents),
        |v AS (
        | SELECT doc_id, lang, n_tokens, h,
        |  CAST((strpos('0123456789abcdef', substr(h,1,1))-1)*268435456.0
        |   + (strpos('0123456789abcdef', substr(h,2,1))-1)*16777216.0
        |   + (strpos('0123456789abcdef', substr(h,3,1))-1)*1048576.0
        |   + (strpos('0123456789abcdef', substr(h,4,1))-1)*65536.0
        |   + (strpos('0123456789abcdef', substr(h,5,1))-1)*4096.0
        |   + (strpos('0123456789abcdef', substr(h,6,1))-1)*256.0
        |   + (strpos('0123456789abcdef', substr(h,7,1))-1)*16.0
        |   + (strpos('0123456789abcdef', substr(h,8,1))-1) AS BIGINT) % 8 AS pack_shard
        | FROM d),
        |c AS (
        | SELECT *, SUM(n_tokens) OVER (PARTITION BY lang, pack_shard ORDER BY h, doc_id
        |   ROWS UNBOUNDED PRECEDING) AS cum FROM v)
        |SELECT lang, doc_id, n_tokens, pack_shard,
        | CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS seq_id,
        | CAST((cum - n_tokens) % 512 AS BIGINT) AS start_off
        |FROM c ORDER BY lang, pack_shard, h, doc_id""".stripMargin,
    "sample_temperature" ->
      """WITH d AS (
        | SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |c AS (SELECT lang, COUNT(*) AS n FROM d GROUP BY 1),
        |m AS (SELECT MIN(n) AS n_min FROM c)
        |SELECT lang, doc_id
        |FROM d JOIN c USING (lang) CROSS JOIN m
        |WHERE ROUND(((
        |   (strpos('0123456789abcdef', substr(h,1,1))-1)*268435456.0
        | + (strpos('0123456789abcdef', substr(h,2,1))-1)*16777216.0
        | + (strpos('0123456789abcdef', substr(h,3,1))-1)*1048576.0
        | + (strpos('0123456789abcdef', substr(h,4,1))-1)*65536.0
        | + (strpos('0123456789abcdef', substr(h,5,1))-1)*4096.0
        | + (strpos('0123456789abcdef', substr(h,6,1))-1)*256.0
        | + (strpos('0123456789abcdef', substr(h,7,1))-1)*16.0
        | + (strpos('0123456789abcdef', substr(h,8,1))-1)
        | + 0.5)) / 4294967296.0, 6) < ROUND(sqrt(CAST(n_min AS DOUBLE) / n), 6)
        |ORDER BY lang, doc_id""".stripMargin,
    "text_boilerplate" ->
      """WITH toks AS (
        | SELECT doc_id, UNNEST(string_split(text, ' ')) AS term,
        |        UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS pos
        | FROM documents),
        |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |thr AS (SELECT COUNT(*) * 4 / 5 AS maxdf FROM documents),
        |kept AS (SELECT doc_id, term, pos FROM toks JOIN dfreq USING (term), thr
        |         WHERE df <= maxdf),
        |rebuilt AS (
        | SELECT doc_id, COUNT(*) AS n_kept, string_agg(term, ' ' ORDER BY pos) AS clean_text
        | FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, len(string_split(d.text, ' ')) AS n_tokens,
        | COALESCE(r.n_kept, 0) AS n_kept, COALESCE(r.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN rebuilt r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_heavyhitters" ->
      """WITH toks AS (SELECT lang, UNNEST(string_split(text, ' ')) AS term FROM documents),
        |c AS (SELECT lang, term, COUNT(*) AS cnt FROM toks GROUP BY lang, term)
        |SELECT lang, rank, term, cnt FROM (
        | SELECT lang, term, cnt,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS INT) AS rank
        | FROM c)
        |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,
    "text_ngrams" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        | SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
        | FROM tok, UNNEST(range(1, len(t))) AS u(i)
        | WHERE len(t) >= 2),
        |per AS (SELECT gram, doc_id, COUNT(*) AS c FROM g GROUP BY gram, doc_id),
        |agg AS (SELECT gram, SUM(c) AS tf, COUNT(*) AS df FROM per GROUP BY gram)
        |SELECT gram, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
        |FROM agg ORDER BY tf DESC, gram LIMIT 30""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT doc_id, term, tf, tfidf, rank FROM (
        | SELECT tf.doc_id, tf.term, tf.tf,
        |  ROUND(tf.tf * ln(n.n * 1.0 / dfq.df), 6) AS tfidf,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |    ORDER BY ROUND(tf.tf * ln(n.n * 1.0 / dfq.df), 6) DESC, tf.term) AS INT) AS rank
        | FROM tf JOIN dfq USING (term), n)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "text_bm25" ->
      """WITH q(query_id, qtext) AS (
        | VALUES (1, 'spark hash join'), (2, 'window agg stream'), (3, 'fast table scan')),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |dl AS (SELECT doc_id, len(t) AS dl FROM toks),
        |tf AS (SELECT doc_id, u.term, COUNT(*) AS tf
        | FROM toks, UNNEST(t) AS u(term) GROUP BY doc_id, u.term),
        |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        |qt AS (SELECT DISTINCT query_id, u.term
        | FROM q, UNNEST(string_split(qtext, ' ')) AS u(term)),
        |contrib AS (
        | SELECT qt.query_id, tf.doc_id,
        |  CAST(ln((CAST(n AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1)
        |   * (CAST(tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1)
        |      / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
        |         * ((1 - CAST(0.75 AS DOUBLE))
        |            + CAST(0.75 AS DOUBLE) * CAST(dl.dl AS DOUBLE) / avgdl)))
        |   AS DECIMAL(18,6)) AS c
        | FROM qt JOIN tf USING (term) JOIN dfq USING (term)
        | JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
        |scored AS (
        | SELECT query_id, doc_id, COUNT(*) AS n_terms, CAST(SUM(c) AS DECIMAL(18,6)) AS score
        | FROM contrib GROUP BY query_id, doc_id)
        |SELECT query_id, doc_id, n_terms, CAST(score AS DOUBLE) AS score, rank FROM (
        | SELECT *, CAST(ROW_NUMBER() OVER (
        |   PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
        | FROM scored)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "text_logprob" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
        |counts AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
        |total AS (SELECT COUNT(*) AS t FROM toks),
        |logp AS (SELECT term, CAST(ROUND(ln(c * 1.0 / t), 6) AS DECIMAL(18,6)) AS lp FROM counts, total)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        | ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
        |FROM toks JOIN logp USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_classifier" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |g AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
         |      FROM t, UNNEST(range(1, len(w))) AS u(i) WHERE len(w) >= 2),
         |gb AS (SELECT doc_id,
         |        CAST(${duckHex8("md5('w|' || gram)")} AS BIGINT) % 4096 AS bucket FROM g),
         |gw AS (SELECT doc_id, md5('wt|' || CAST(bucket AS VARCHAR)) AS wh FROM gb),
         |s AS (SELECT doc_id,
         |        SUM(CAST(${duckHex8("wh")} AS BIGINT) % 2001 - 1000) AS raw,
         |        COUNT(*) AS n
         |      FROM gw GROUP BY doc_id)
         |SELECT t.doc_id AS doc_id, COALESCE(n, 0) AS n_grams,
         | COALESCE(raw, 0) / (1000.0 * GREATEST(COALESCE(n, 0), 1)) AS score,
         | COALESCE(raw, 0) / (1000.0 * GREATEST(COALESCE(n, 0), 1)) > 0 AS accept
         |FROM t LEFT JOIN s ON t.doc_id = s.doc_id ORDER BY t.doc_id""".stripMargin,
    // text_lexdiv: per-source TTR / hapax / top-term shares as exact
    // floor-integer micros (BIGINT // BIGINT on both engines)
    "text_lexdiv" ->
      """WITH tf AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS f FROM (
        |  SELECT source, UNNEST(string_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL) GROUP BY source, w),
        |st AS (SELECT source, CAST(SUM(f) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST(MAX(f) AS BIGINT) AS top_f FROM tf GROUP BY source),
        |d AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |      FROM documents WHERE text IS NOT NULL GROUP BY source)
        |SELECT d.source, d.n_docs, s.n_tokens, s.n_types, s.n_hapax, s.top_f,
        | (s.n_types * 1000000) // s.n_tokens AS ttr_micros,
        | (s.n_hapax * 1000000) // s.n_tokens AS hapax_micros,
        | (s.top_f * 1000000) // s.n_tokens AS top_micros
        |FROM d JOIN st s ON d.source = s.source
        |ORDER BY d.source""".stripMargin,
    // text_vocab_coverage: deterministic top-V vocabulary (count desc,
    // term tie-break), per-language OOV share in half-up integer micros
    "text_vocab_coverage" ->
      """WITH t AS (SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS w
        |           FROM documents),
        |v AS (SELECT w, 1 AS i FROM (
        |  SELECT w, COUNT(*) AS n FROM t GROUP BY w ORDER BY n DESC, w LIMIT 20)),
        |j AS (SELECT t.doc_id, t.lang, CASE WHEN v.i IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM t LEFT JOIN v USING (w)),
        |a AS (SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_tokens,
        |       SUM(oov) AS oov FROM j GROUP BY lang)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
        | CAST(n_tokens AS BIGINT) AS n_tokens, CAST(oov AS BIGINT) AS oov_tokens,
        | CAST((2 * 1000000 * oov + n_tokens) // (2 * n_tokens) AS DOUBLE)
        |   / 1000000.0 AS oov_share
        |FROM a ORDER BY lang""".stripMargin,
    // text_classifier_train: Curation.trainClassifier's two GD iterations
    // unrolled — w0 = 0 makes iteration 1's gradient the closed form
    // Σ(−label)·x; all arithmetic exact BIGINT, step = 1/trace(XᵀX),
    // half-away integer division mirrored via the CASE idiom.
    "text_classifier_train" ->
      s"""$classifierTrainCtes
         |SELECT bucket, CAST(wm AS BIGINT) AS weight_micros,
         | CAST(wm AS DOUBLE) / 1000000.0 AS weight
         |FROM w2 ORDER BY bucket""".stripMargin,
    // text_classifier_calibration: the same trained w2 weights serve
    // every document (bias included via xb's bucket-64 rows); the score
    // bucket is an exact multiple of 1000 so floor ≡ truncate on
    // negatives in both engines
    "text_classifier_calibration" ->
      s"""$classifierTrainCtes,
         |p3 AS (SELECT doc_id, SUM(w2.wm * x) AS p
         |       FROM xb JOIN w2 USING (bucket) GROUP BY doc_id),
         |cal AS (SELECT ((p - ((p % 1000) + 1000) % 1000) // 1000) AS sb,
         |         t.tt // 1000000 AS y
         |        FROM p3 JOIN t USING (doc_id)),
         |a AS (SELECT sb, COUNT(*) AS n_docs, SUM(y) AS n_pos FROM cal GROUP BY sb)
         |SELECT CAST(sb AS BIGINT) AS bucket,
         | CAST(sb * 1000 AS DOUBLE) / 1000000.0 AS score_lo,
         | CAST(n_docs AS BIGINT) AS n_docs, CAST(n_pos AS BIGINT) AS n_pos,
         | CAST((2 * 1000000 * n_pos + n_docs) // (2 * n_docs) AS DOUBLE)
         |   / 1000000.0 AS pos_share
         |FROM a ORDER BY bucket""".stripMargin,
    "sample_importance" ->
      s"""WITH b AS (
         | SELECT doc_id, lang = 'en' AS is_t,
         |  CAST(${duckHex8("md5('f|' || wd)")} AS BIGINT) % 2048 AS bucket
         | FROM (SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS wd FROM documents)),
         |cnt AS (SELECT bucket, COUNT(*) AS cs,
         |         SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct FROM b GROUP BY bucket),
         |tot AS (SELECT COUNT(*) AS ns, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt FROM b),
         |ratio AS (SELECT bucket,
         |  CAST(ROUND(ln(((ct + 1.0) * (ns + 2048.0)) / ((cs + 1.0) * (nt + 2048.0))), 6)
         |   AS DECIMAL(18,6)) AS r FROM cnt, tot),
         |doc AS (SELECT doc_id, bucket, COUNT(*) AS c FROM b GROUP BY doc_id, bucket)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         | CAST(SUM(CAST(c AS DECIMAL(12,0)) * r) AS DOUBLE) AS log_weight
         |FROM doc JOIN ratio USING (bucket)
         |GROUP BY doc_id ORDER BY log_weight DESC, doc_id LIMIT 100""".stripMargin,
    "text_bigram" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |g AS (SELECT doc_id, toks[i] AS v, toks[i+1] AS w
        |  FROM tk, UNNEST(range(1, len(toks))) AS u(i)),
        |pd AS (SELECT v, w, doc_id, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
        |bi AS (SELECT v, w, CAST(SUM(c) AS BIGINT) AS cvw FROM pd GROUP BY 1, 2),
        |ctx AS (SELECT v, CAST(SUM(cvw) AS BIGINT) AS cv FROM bi GROUP BY 1),
        |vocab AS (SELECT COUNT(DISTINCT t) AS nvocab FROM
        |  (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
        |lp AS (SELECT v, w,
        |  CAST(ROUND(ln(CAST(cvw + 1 AS DOUBLE) / (cv + nvocab)), 6) AS DECIMAL(18,6)) AS lp
        | FROM bi JOIN ctx USING (v), vocab)
        |SELECT doc_id, n AS n_bigrams,
        | CAST(SIGN(s) * ((2 * ABS(s) + n) // (2 * n)) AS DOUBLE) / 1000000.0 AS avg_logprob
        |FROM (
        | SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(c AS DECIMAL(12,0)) * lp) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS s
        | FROM pd JOIN lp USING (v, w) GROUP BY doc_id) t
        |ORDER BY doc_id""".stripMargin,
    "text_cms" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
         |cnt AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
         |probes AS (SELECT t, n FROM cnt ORDER BY n DESC, t LIMIT 5),
         |rws AS (SELECT CAST(r AS INT) AS r FROM range(0, 4) q(r)),
         |sketch AS (
         | SELECT r, CAST(${duckHex8("md5(CAST(r AS VARCHAR) || '|' || t)")} AS BIGINT) % 1024 AS b,
         |  COUNT(*) AS n
         | FROM tok CROSS JOIN rws GROUP BY 1, 2),
         |est AS (
         | SELECT p.t, MIN(COALESCE(s.n, 0)) AS cms_est
         | FROM probes p CROSS JOIN rws r
         | LEFT JOIN sketch s ON s.r = r.r
         |  AND s.b = CAST(${duckHex8("md5(CAST(r.r AS VARCHAR) || '|' || p.t)")} AS BIGINT) % 1024
         | GROUP BY p.t)
         |SELECT e.t AS term, CAST(e.cms_est AS BIGINT) AS cms_est, p.n AS exact_n
         |FROM est e JOIN probes p USING (t) ORDER BY term""".stripMargin,
    // L46: the trained merge table itself — 8 rounds of the sentinel-
    // string merge chain; "left"/"right" quoted (reserved words)
    "text_bpe" ->
      s"""$bpeMergeCtes
         |SELECT merge_rank, a AS "left", b AS "right", n AS pair_count
         |FROM merges ORDER BY merge_rank""".stripMargin,
    // L56: per-word BPE token counts from the round-8 vocabulary reprs,
    // rolled up per language with the half-up integer-micros ratios
    "text_fertility" ->
      s"""$bpeMergeCtes,
         |wf AS (SELECT w, CAST(len(string_split(substr(rep, 2, length(rep)-2), chr(3)||chr(2))) AS BIGINT) AS nb
         |       FROM w8),
         |d AS (SELECT doc_id, lang, CAST(length(replace(text, ' ', '')) AS BIGINT) AS ch,
         |       string_split(text, ' ') AS toks FROM documents),
         |dw AS (SELECT doc_id, unnest(toks) AS w FROM d),
         |pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ws_tokens, CAST(SUM(wf.nb) AS BIGINT) AS bpe_tokens
         |       FROM dw JOIN wf USING (w) GROUP BY doc_id),
         |agg AS (SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(pd.ws_tokens) AS BIGINT) AS n_words,
         |  CAST(SUM(pd.bpe_tokens) AS BIGINT) AS n_bpe_tokens,
         |  CAST(SUM(d.ch) AS BIGINT) AS n_chars
         | FROM d JOIN pd USING (doc_id) GROUP BY d.lang)
         |SELECT lang, n_docs, n_words, n_bpe_tokens, n_chars,
         | CAST((2 * 1000000 * n_bpe_tokens + n_words) // (2 * n_words) AS DOUBLE) / 1000000.0 AS tokens_per_word,
         | CAST((2 * 1000000 * n_bpe_tokens + n_chars) // (2 * n_chars) AS DOUBLE) / 1000000.0 AS tokens_per_char
         |FROM agg ORDER BY lang""".stripMargin,
    // L54: encode (vocab ids = sorted distinct chars then merge
    // products in rank order, later duplicate product winning like
    // Map.toMap) → md5-sharded layout → per-sequence scalar digests
    "text_training_sequences" ->
      s"""$bpeMergeCtes,
         |wsyms AS (SELECT w, string_split(substr(rep, 2, length(rep)-2), chr(3)||chr(2)) AS syms FROM w8),
         |chars AS (SELECT DISTINCT unnest(string_split(replace(text, ' ', ''), '')) AS sym
         |          FROM documents),
         |charid AS (SELECT sym, CAST(ROW_NUMBER() OVER (ORDER BY sym) - 1 AS INT) AS id
         |           FROM chars WHERE sym <> ''),
         |nch AS (SELECT COUNT(*) AS nc FROM charid),
         |vocab0 AS (SELECT sym, id FROM charid
         | UNION ALL SELECT m.a || m.b AS sym, CAST(nch.nc + m.merge_rank - 1 AS INT) AS id
         |           FROM merges m, nch),
         |vocab AS (SELECT sym, MAX(id) AS id FROM vocab0 GROUP BY sym),
         |dtok AS (SELECT doc_id, toks[CAST(i AS INT)] AS w, i AS wpos
         | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |  UNNEST(range(1, len(toks) + 1)) AS u(i)),
         |dsym AS (SELECT d.doc_id, d.wpos, j, ws.syms[CAST(j AS INT)] AS sym
         | FROM dtok d JOIN wsyms ws USING (w), UNNEST(range(1, len(ws.syms) + 1)) AS u(j)),
         |ids AS (SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wpos, j) - 1 AS BIGINT) AS idx,
         |  COALESCE(v.id, -1) AS id
         | FROM dsym LEFT JOIN vocab v USING (sym)),
         |dn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt FROM ids GROUP BY doc_id),
         |sh AS (SELECT doc_id, nt, md5(CAST(doc_id AS VARCHAR)) AS ord FROM dn),
         |sh2 AS (SELECT doc_id, nt, ord,
         |  CAST(${duckHex8("ord")} AS BIGINT) % 16 AS pack_shard FROM sh),
         |st AS (SELECT doc_id, pack_shard,
         |  CAST(SUM(nt) OVER (PARTITION BY pack_shard ORDER BY ord, doc_id) - nt AS BIGINT) AS strt
         | FROM sh2),
         |pos AS (SELECT st.pack_shard, CAST(st.strt + i.idx AS BIGINT) AS p, i.id
         | FROM ids i JOIN st USING (doc_id))
         |SELECT pack_shard, CAST(p // 128 AS BIGINT) AS seq_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         | CAST(SUM(id) AS BIGINT) AS ids_sum, arg_min(id, p) AS ids_head, arg_max(id, p) AS ids_tail
         |FROM pos GROUP BY pack_shard, p // 128 ORDER BY pack_shard, seq_id""".stripMargin,
    "export_shards" ->
      s"""WITH h AS (SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
         |a AS (SELECT doc_id, n_chars, h,
         |  CAST(${duckHex8("h")} AS BIGINT) % 8 AS shard FROM h),
         |p AS (SELECT shard, n_chars,
         |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS pos FROM a)
         |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, MAX(pos) AS max_pos
         |FROM p GROUP BY shard ORDER BY shard""".stripMargin,
    "text_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks, len(string_split(text,' ')) AS n FROM documents),
        |c AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |  list_slice(toks, CAST(i*48+1 AS INT), CAST(i*48+64 AS INT)) AS chunk
        | FROM t, UNNEST(range(0, CASE WHEN n <= 64 THEN 1 ELSE 1 + CAST(CEIL((n-64)*1.0/48) AS INT) END)) AS u(i))
        |SELECT doc_id, chunk_idx, array_to_string(chunk, ' ') AS chunk_text, CAST(len(chunk) AS INT) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "embedding_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc FROM e)
        |SELECT vec_id, ROUND(sc, 6) AS scale,
        | CAST(list_aggregate(list_transform(v,
        |   x -> CASE WHEN sc > 0 THEN least(greatest(round(x/sc, 0), -127), 127) ELSE 0 END), 'sum') AS BIGINT) AS q_sum,
        | ROUND(list_max(list_transform(v,
        |   x -> abs(x - (CASE WHEN sc > 0 THEN least(greatest(round(x/sc, 0), -127), 127) ELSE 0 END) * sc))), 6) AS max_abs_err
        |FROM s ORDER BY vec_id""".stripMargin,
    "dedup_keeper_quality" ->
      """WITH RECURSIVE tok AS (
        | SELECT doc_id, lang, CAST(n_chars // 50 AS INT) AS band, string_split(text, ' ') AS toks
        | FROM documents),
        |sh AS (
        | SELECT DISTINCT doc_id, lang, band, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        | FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
        | WHERE len(toks) >= 3),
        |kept AS (
        | SELECT * FROM (
        |  SELECT doc_id, lang, band, s, COUNT(*) OVER (PARTITION BY lang, band, s) AS df FROM sh)
        | WHERE df <= 128),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        |prs AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
        | GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        | SELECT a_id, b_id FROM prs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
        | WHERE ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.3),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs UNION SELECT b_id, a_id FROM pairs),
        |reach AS (
        | SELECT src AS id, dst AS r FROM edges
        | UNION
        | SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
        |q AS (SELECT doc_id,
        |  ROUND(len(list_filter(string_split(text,' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','that'], x))) * 1.0
        |   / len(string_split(text,' ')), 6) AS quality_score
        | FROM documents),
        |lab AS (SELECT id AS doc_id, LEAST(id, MIN(r)) AS cluster_id FROM reach GROUP BY id),
        |rk AS (SELECT lab.doc_id, cluster_id, quality_score,
        |  ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY quality_score DESC, lab.doc_id) AS rn
        | FROM lab JOIN q ON lab.doc_id = q.doc_id)
        |SELECT doc_id, cluster_id, quality_score, (rn = 1) AS keep FROM rk ORDER BY doc_id""".stripMargin,
    "dedup_cluster_split" ->
      """WITH RECURSIVE tok AS (
        | SELECT doc_id, lang, CAST(n_chars // 50 AS INT) AS band, string_split(text, ' ') AS toks
        | FROM documents),
        |sh AS (
        | SELECT DISTINCT doc_id, lang, band, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        | FROM tok, UNNEST(range(1, len(toks) - 1)) AS u(i)
        | WHERE len(toks) >= 3),
        |kept AS (
        | SELECT * FROM (
        |  SELECT doc_id, lang, band, s, COUNT(*) OVER (PARTITION BY lang, band, s) AS df FROM sh)
        | WHERE df <= 128),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
        |prs AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        | FROM kept a JOIN kept b ON a.s = b.s AND a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
        | GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        | SELECT a_id, b_id FROM prs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
        | WHERE ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.3),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs UNION SELECT b_id, a_id FROM pairs),
        |reach AS (
        | SELECT src AS id, dst AS r FROM edges
        | UNION
        | SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
        |lab AS (SELECT id AS doc_id, LEAST(id, MIN(r)) AS cluster_id FROM reach GROUP BY id),
        |alldocs AS (SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
        | FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
        |keyed AS (SELECT doc_id, cluster_id, md5(CAST(cluster_id AS VARCHAR)) AS h FROM alldocs),
        |b AS (SELECT doc_id, cluster_id,
        | CAST((strpos('0123456789abcdef', substr(h,1,1))-1)*268435456.0
        |  + (strpos('0123456789abcdef', substr(h,2,1))-1)*16777216.0
        |  + (strpos('0123456789abcdef', substr(h,3,1))-1)*1048576.0
        |  + (strpos('0123456789abcdef', substr(h,4,1))-1)*65536.0
        |  + (strpos('0123456789abcdef', substr(h,5,1))-1)*4096.0
        |  + (strpos('0123456789abcdef', substr(h,6,1))-1)*256.0
        |  + (strpos('0123456789abcdef', substr(h,7,1))-1)*16.0
        |  + (strpos('0123456789abcdef', substr(h,8,1))-1) AS BIGINT) % 100 AS bb FROM keyed)
        |SELECT doc_id, cluster_id,
        | CASE WHEN bb < 10 THEN 'test' WHEN bb < 20 THEN 'val' ELSE 'train' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    // L71: constant-gray rasters make the canonical 8×8×3 pixel render
    // 192 copies of the gray joined '|'; md5 of that string IS the
    // signature, so the oracle groups by the same digest the engine
    // computes from decoded pixels.
    "multimodal_phash" ->
      """WITH d AS (SELECT doc_id,
        |  doc_id % 10 = 0 AS corrupt,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg'
        |       ELSE 'bmp' END AS fmt,
        |  doc_id % 256 AS g
        | FROM documents),
        |sig AS (SELECT doc_id, fmt AS format,
        |  md5(array_to_string(list_transform(range(0, 192),
        |    x -> CAST(g AS VARCHAR)), '|')) AS psig
        | FROM d WHERE NOT corrupt),
        |grp AS (SELECT psig, MIN(doc_id) AS keeper, COUNT(*) AS group_size
        | FROM sig GROUP BY psig),
        |valid AS (SELECT s.doc_id, s.format, g.keeper,
        |  s.doc_id = g.keeper AS kept, g.group_size
        | FROM sig s JOIN grp g USING (psig)),
        |bad AS (SELECT doc_id, 'unknown' AS format, doc_id AS keeper,
        |  TRUE AS kept, CAST(1 AS BIGINT) AS group_size
        | FROM d WHERE corrupt)
        |SELECT doc_id, format, keeper, kept, group_size
        |FROM (SELECT * FROM valid UNION ALL SELECT * FROM bad)
        |ORDER BY doc_id""".stripMargin,
    // L71b: the naive quadratic truth over closed-form rasters — the
    // per-cell bit is (base + 13x + 29y) mod 256 >= 128 with the
    // planted tile's +128 flip; hamming = count of differing bits.
    // The banded engine is exact (pigeonhole), so naive == banded.
    "multimodal_phash_near" ->
      """WITH d AS (SELECT doc_id, (doc_id % 128) * 2 AS base,
        |  doc_id % 10 = 0 AS corrupt,
        |  CASE WHEN doc_id % 5 = 0 THEN doc_id % 64 ELSE -1 END AS fc
        | FROM documents),
        |cells AS (SELECT CAST(a.range AS BIGINT) AS x, CAST(b.range AS BIGINT) AS y
        |          FROM range(0, 8) a, range(0, 8) b),
        |px AS (SELECT doc_id,
        |  CASE WHEN y*8 + x = fc THEN ((base + x*13 + y*29) % 256 + 128) % 256
        |       ELSE (base + x*13 + y*29) % 256 END >= 128 AS bit,
        |  x, y
        | FROM d CROSS JOIN cells WHERE NOT corrupt),
        |pairs AS (SELECT p.doc_id AS a_id, q.doc_id AS b_id,
        |  SUM(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END) AS hamming
        | FROM px p JOIN px q ON p.x = q.x AND p.y = q.y AND p.doc_id < q.doc_id
        | GROUP BY 1, 2)
        |SELECT a_id, b_id, CAST(hamming AS INT) AS hamming
        |FROM pairs WHERE hamming <= 3 ORDER BY a_id, b_id""".stripMargin,
    "multimodal_decode" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 10 = 0 THEN 'unknown'
        |      WHEN doc_id % 3 = 0 THEN 'png'
        |      WHEN doc_id % 3 = 1 THEN 'jpeg'
        |      ELSE 'bmp' END AS format,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE n_chars % 31 + 4 END AS BIGINT) AS width,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE doc_id % 17 + 4 END AS BIGINT) AS height,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN 0 ELSE 3 END AS BIGINT) AS n_channels,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE doc_id % 256 END AS BIGINT) AS mean_px
        |FROM documents ORDER BY doc_id""".stripMargin,
    // multimodal_patches: the grid geometry (boxResize regions) in
    // closed form — every source is 3-band, constant-gray inputs make
    // every patch mean the gray and every variance exactly 0
    "multimodal_patches" ->
      """WITH d AS (SELECT doc_id,
        |  doc_id % 10 = 0 AS corrupt,
        |  CAST(n_chars % 31 + 4 AS BIGINT) AS w, CAST(doc_id % 17 + 4 AS BIGINT) AS h,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg'
        |       ELSE 'bmp' END AS fmt
        | FROM documents),
        |g AS (SELECT CAST(a.pr AS BIGINT) AS pr, CAST(b.pc AS BIGINT) AS pc
        |      FROM range(0, 4) a(pr), range(0, 4) b(pc)),
        |valid AS (
        | SELECT doc_id, fmt AS format, CAST(pr AS INT) AS patch_row,
        |  CAST(pc AS INT) AS patch_col,
        |  CAST(((pc+1)*w//4 - pc*w//4) * ((pr+1)*h//4 - pr*h//4) * 3 AS BIGINT) AS n_px,
        |  CAST(doc_id % 256 AS BIGINT) AS mean_px, CAST(0 AS BIGINT) AS var_px
        | FROM d CROSS JOIN g WHERE NOT corrupt),
        |bad AS (SELECT doc_id, 'unknown' AS format, -1 AS patch_row, -1 AS patch_col,
        |  CAST(-1 AS BIGINT) AS n_px, CAST(-1 AS BIGINT) AS mean_px,
        |  CAST(-1 AS BIGINT) AS var_px
        | FROM d WHERE corrupt)
        |SELECT doc_id, format, patch_row, patch_col, n_px, mean_px, var_px
        |FROM (SELECT * FROM valid UNION ALL SELECT * FROM bad)
        |ORDER BY doc_id, patch_row, patch_col""".stripMargin,
    // multimodal_resize: a constant-gray input stays exactly constant
    // under box-average resampling, so the 8×8 output's mean is the
    // input gray; dims/format mirror multimodal_decode's closed form
    "multimodal_resize" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 10 = 0 THEN 'unknown'
        |      WHEN doc_id % 3 = 0 THEN 'png'
        |      WHEN doc_id % 3 = 1 THEN 'jpeg'
        |      ELSE 'bmp' END AS format,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE n_chars % 31 + 4 END AS BIGINT) AS width,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE doc_id % 17 + 4 END AS BIGINT) AS height,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE 8 END AS BIGINT) AS out_width,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE 8 END AS BIGINT) AS out_height,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE doc_id % 256 END AS BIGINT) AS out_mean_px
        |FROM documents ORDER BY doc_id""".stripMargin,
    // multimodal_resample: constant-amplitude PCM stays exactly constant
    // under endpoint-aligned linear interpolation; out_samples is the
    // integer floor n·16000/rate (≥ 1)
    "multimodal_resample" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 10 = 0 THEN 'unknown' ELSE 'wav' END AS format,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE 8000 + (doc_id % 4) * 4000 END AS BIGINT) AS sample_rate,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE n_chars % 500 + 50 END AS BIGINT) AS n_samples,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE 16000 END AS BIGINT) AS out_rate,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1
        |      ELSE GREATEST((n_chars % 500 + 50) * 16000 // (8000 + (doc_id % 4) * 4000), 1) END AS BIGINT) AS out_samples,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE abs((doc_id * 37) % 30000 - 15000) END AS BIGINT) AS out_mean_abs
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_audio" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 10 = 0 THEN 'unknown' ELSE 'wav' END AS format,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE 8000 + (doc_id % 4) * 4000 END AS BIGINT) AS sample_rate,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_channels,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE 16 END AS BIGINT) AS bits,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE n_chars % 500 + 50 END AS BIGINT) AS n_samples,
        | CAST(CASE WHEN doc_id % 10 = 0 THEN -1 ELSE abs((doc_id * 37) % 30000 - 15000) END AS BIGINT) AS mean_abs
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_video" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        | CAST(n_chars % 21 + 4 AS BIGINT) AS width,
        | CAST(doc_id % 13 + 4 AS BIGINT) AS height,
        | CAST((doc_id + 41 * i) % 256 AS BIGINT) AS mean_px
        |FROM documents, UNNEST(range(0, doc_id % 4 + 2)) t(i)
        |WHERE doc_id % 10 <> 0
        |UNION ALL
        |SELECT doc_id, CAST(-1 AS BIGINT) AS frame_idx, CAST(-1 AS BIGINT) AS width,
        | CAST(-1 AS BIGINT) AS height, CAST(-1 AS BIGINT) AS mean_px
        |FROM documents WHERE doc_id % 10 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id, CAST(i AS INT) AS frame_idx, CAST(i * 256 AS BIGINT) AS frame_offset,
        | CAST(ord(substr(text, CAST(i * 256 + 1 AS INT), 1)) AS BIGINT) AS first_byte
        |FROM documents, UNNEST(range(0, least(octet_length(encode(text)) // 256, 8))) t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "pipeline_stats" ->
      s"""WITH lang AS (
         | SELECT doc_id, text, n_chars, $langCase AS pred_lang,
         |  len(string_split(text,' ')) AS n_words,
         |  list_aggregate(list_transform(string_split(text,' '), x -> len(x)), 'sum') AS sum_len
         | FROM documents),
         |flt AS (
         | SELECT * FROM lang
         | WHERE n_words >= 10 AND n_words <= 1000
         |  AND ROUND(sum_len * 1.0 / n_words, 6) >= 2.0
         |  AND ROUND(sum_len * 1.0 / n_words, 6) <= 12.0),
         |ded AS (
         | SELECT * FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM flt)
         | WHERE rn = 1)
         |SELECT pred_lang, COUNT(*) AS n_docs,
         | CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS sum_ws_tokens,
         | CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS sum_bpe_tokens,
         | CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM ded GROUP BY pred_lang ORDER BY pred_lang""".stripMargin,
  )
}
