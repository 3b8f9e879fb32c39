package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Text, Vectors}

/** Deduplication family for LLM-data pipelines (SURVEY §2 L1–L5).
  *
  * Scale design (SURVEY §5): every near-dup variant generates candidate
  * pairs ONLY inside bounded blocks/buckets (language × length band,
  * LSH band buckets) — never an unblocked all-pairs join — so candidate
  * counts stay near-linear at 100 TB. Verification (exact jaccard /
  * cosine) runs only on candidates. Pair generation itself runs through
  * the custom whole-operator plan [[graft.plans.Pairs]]: one clustering
  * exchange + streaming per-key pair emission, half the shuffle volume
  * of the self-join it replaces, with an explicit per-key skew bound.
  */
object Dedup {

  /** Exact dedup by content hash: one hash aggregation, keep-first by id.
    * Returns (h, keep_id, n) per distinct content. At 100 TB the groupBy
    * key is the 128-bit hash, not the document text, so shuffle volume
    * is O(rows × 16 bytes). */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** Block key: language × length band — bounds candidate generation.
    * NOTE the recall trade measured on the test corpus: 19 of 25 true
    * near-dup pairs are the same text under different language labels,
    * which lang-blocking excludes by design. Blocking is the right
    * 100 TB default (it bounds candidates); choose the block key per
    * corpus — the streaming variant (Streams.minhashCandidates) runs
    * unblocked and found all 25. */
  private def blockCols(df: DataFrame, bandWidth: Int): DataFrame =
    df.withColumn("__band", (col("n_chars") / bandWidth).cast("int"))

  /** Idempotent persist, registered with the session-level
    * [[graft.OperatorCache]] so `Graft.clearOperatorCaches()` (or the
    * driver surfaces' per-query clear) releases every operator
    * intermediate without touching user caches. See OperatorCache for
    * the lifecycle contract. */
  private def cached(df: DataFrame): DataFrame = graft.OperatorCache.cached(df)

  /** Signature computation is compute-bound per row — scatter it across
    * all cores regardless of input file splits (a single small parquet
    * file otherwise pins the whole stage to one task; at cluster scale
    * the shuffle is one row-sized pass, negligible next to the per-row
    * hashing work it parallelizes). */
  private def scatter(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Distinct word-n-gram shingles per doc (docs with ≥ n tokens). */
  private def shingled(docs: DataFrame, n: Int, bandWidth: Int): DataFrame =
    scatter(blockCols(docs, bandWidth)
      .filter(size(Text.tokens(col("text"))) >= n))
      .select(col("doc_id"), col("lang"), col("__band"),
        Text.wordShingles(col("text"), n).as("__sh"))

  /** Exact n-gram Jaccard near-dup pairs within (lang, band) blocks:
    * explode shingles → document-frequency cut → self-join on
    * (shingle, block) → count intersections → join per-doc set sizes →
    * threshold. This is the verification-grade twin the approximate
    * variants are tested against.
    *
    * The df-cut is the 100 TB safety valve: a shingle present in d docs
    * of one block contributes d² rows to the self-join, so one hot
    * 3-gram ("of the and"-class) is a skewed quadratic key. Shingles
    * with per-block document frequency > maxDf carry no similarity
    * signal (they're corpus boilerplate) and are dropped from BOTH the
    * intersection and the set sizes — the semantic is "jaccard over
    * informative shingles", mirrored exactly in the DuckDB oracle. The
    * cut is computed with a window over the same keys the self-join
    * shuffles on, so it costs no extra exchange. */
  def ngramJaccardPairs(
      docs: DataFrame,
      n: Int = 3,
      tau: Double = 0.3,
      bandWidth: Int = 50,
      maxDf: Int = 128): DataFrame =
    ngramJaccardFrom(shingled(docs, n, bandWidth), tau, maxDf)

  /** L55: dedup threshold-sensitivity report — the calibration table a
    * dedup rollout reads BEFORE choosing τ ("how aggressive should
    * dedup be"): for each candidate threshold, how many verified pairs
    * qualify and how many documents are touched. ONE verified-pair
    * pass at the floor threshold feeds every candidate τ (a pair
    * qualifies for all τ ≤ its jaccard; a doc for all τ ≤ its best
    * pair's jaccard) — rerunning the dedup per candidate is the
    * anti-pattern this table exists to avoid. Thresholds compare as
    * INTEGER MICROS against round(jaccard·1e6) so the τ = j boundary
    * is engine-exact (a raw double compare at e.g. 0.65 is not).
    * Candidate τs with nothing qualifying still emit (zeros). */
  def thresholdReport(docs: DataFrame,
      tauMicros: Seq[Long] = (6 to 19).map(_ * 50000L)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val floor = tauMicros.min.toDouble / 1000000.0
    val pairs = graft.OperatorCache.cached(
      ngramJaccardPairs(docs, tau = floor)
        .withColumn("__j6", round(col("jaccard") * 1000000, 0).cast("long")))
    val tl = typedLit(tauMicros.sorted)
    val byPair = pairs.select(col("__j6"), explode(tl).as("tau_micros"))
      .filter(col("__j6") >= col("tau_micros"))
      .groupBy("tau_micros").agg(count(lit(1)).as("n_pairs"))
    val byDoc = pairs
      .select(explode(array(col("a_id"), col("b_id"))).as("doc_id"), col("__j6"))
      .groupBy("doc_id").agg(max(col("__j6")).as("__best"))
      .select(col("__best"), explode(tl).as("tau_micros"))
      .filter(col("__best") >= col("tau_micros"))
      .groupBy("tau_micros").agg(count(lit(1)).as("n_docs"))
    tauMicros.sorted.toDF("tau_micros")
      .join(byPair, Seq("tau_micros"), "left")
      .join(byDoc, Seq("tau_micros"), "left")
      .select(col("tau_micros"),
        (col("tau_micros").cast("double") / 1000000.0).as("tau"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy("tau_micros")
  }

  /** L78: near-dup REVIEW QUEUE — the deterministic, similarity-
    * stratified sample of candidate pairs a human QA pass actually
    * reads before a threshold ships: `perBand` pairs from every
    * 0.1-wide Jaccard band, picked by a content-hash priority (md5 of
    * the id pair) so the queue is reproducible run-to-run and unbiased
    * by scan order — the missing middle of the L55 → L57 workflow
    * (the threshold report says WHERE the mass is, explain-pair says
    * WHY one pair matched; this picks WHICH pairs to eyeball).
    *
    * Scale: rides the SAME blocked/df-cut pair generation as L2 (no
    * all-pairs stage); the per-band top-k window shuffles only the
    * candidate-pair relation — O(near-dup pairs), not O(corpus) — and
    * k·10 rows come out. Band count is ≤ 10, so a pathologically
    * duplicate-heavy corpus concentrates one band's pairs in one
    * partition; if that ever bites, pre-thin with a hash-prefix gate
    * before the window (the A17 salting family). */
  def reviewQueue(docs: DataFrame, perBand: Int = 5): DataFrame = {
    require(perBand > 0, "need perBand > 0")
    val pairs = ngramJaccardPairs(docs)
      .withColumn("__j6", round(col("jaccard") * 1000000, 0).cast("long"))
      .withColumn("band_micros", expr("(__j6 div 100000) * 100000"))
      .withColumn("__pr", md5(concat_ws(":", col("a_id"), col("b_id"))))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band_micros")
      .orderBy(col("__pr"), col("a_id"), col("b_id"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= perBand)
      .select(col("band_micros"), col("rank"), col("a_id"), col("b_id"),
        col("__j6").as("jaccard_micros"))
      .orderBy("band_micros", "rank")
  }

  /** L79: dedup COST pre-flight — "will this pair stage explode, and
    * what is the maxDf cut buying" BEFORE the big run: per (lang,
    * length-band) block, document and distinct-shingle counts, the
    * EXACT self-join row count the pair stage will produce under the
    * cut (Σ C(df,2) over shingles with df ≤ maxDf), and what the cut
    * drops (shingles over the df limit and the quadratic rows they
    * would have contributed). The knob-tuning table for
    * maxDf/bandWidth at 100 TB: a block whose cut_pairs dwarfs
    * est_pairs is boilerplate-dominated and safe; a block whose
    * est_pairs is itself quadratic needs a tighter cut or band.
    *
    * Cost: one shingle pass + two map-side-combinable rollups (df per
    * shingle, then the block summary) — O(distinct shingles) shuffle,
    * NO self-join, which is the point: the report prices the join
    * without running it. Raw shingle text (the explain-pair
    * discipline) so the ANSI oracle recomputes it verbatim. */
  def dedupCostReport(docs: DataFrame, n: Int = 3, bandWidth: Int = 50,
      maxDf: Int = 128): DataFrame = {
    // ONE shingle pass feeds both the df rollup and the block doc
    // counts (the ngramJaccardFrom single-scan discipline)
    val sh = cached(shingled(docs, n, bandWidth))
    val ex = sh.select(col("doc_id"), col("lang"), col("__band"),
      explode(col("__sh")).as("__s"))
    val dfs = ex.groupBy("lang", "__band", "__s")
      .agg(count(lit(1)).as("__df"))
    val nd = sh.groupBy("lang", "__band").agg(count(lit(1)).as("n_docs"))
    dfs.groupBy("lang", "__band").agg(
      count(lit(1)).as("n_shingles"),
      sum(when(col("__df") <= maxDf, expr("__df * (__df - 1) div 2"))
        .otherwise(0L)).as("est_pairs"),
      sum(when(col("__df") > maxDf, 1L).otherwise(0L)).as("cut_shingles"),
      sum(when(col("__df") > maxDf, expr("__df * (__df - 1) div 2"))
        .otherwise(0L)).as("cut_pairs"))
      .join(nd, Seq("lang", "__band"))
      .select(col("lang"), col("__band").as("band"), col("n_docs"),
        col("n_shingles"), col("est_pairs"), col("cut_shingles"), col("cut_pairs"))
      .orderBy("lang", "band")
  }

  /** Adaptive-threshold variant of [[ngramJaccardPairs]]: instead of a
    * fixed df cut, the threshold is
    * `greatest(minDf, floor(percentile(df, dfQuantile)))` over the
    * distinct-shingle document-frequency distribution — the cut tracks
    * what "boilerplate" means in THIS corpus. `minDf` is a floor, so on
    * a dup-heavy corpus (where even informative shingles have high df —
    * e.g. 500 copies of one document) the quantile can only RAISE the
    * cut, never drop legitimate near-dup signal below the fixed floor.
    * The threshold is one bounded aggregate broadcast back into the
    * plan (no collected literal — plan shape stays constant for JIT
    * warmup). `exactQuantile = false` is the 100 TB knob: it swaps the
    * exact percentile (full sort of the distinct df distribution) for
    * `percentile_approx` (a bounded KLL-style sketch, one pass, no
    * sort). The exact form stays the default because the DuckDB oracle
    * mirrors `quantile_cont` bit-for-bit; the spec pins that at high
    * accuracy the approx path selects the SAME threshold (and thus the
    * same pairs) on the verification corpus. */
  def ngramJaccardPairsAdaptive(
      docs: DataFrame,
      n: Int = 3,
      tau: Double = 0.3,
      bandWidth: Int = 50,
      minDf: Int = 16,
      dfQuantile: Double = 0.999,
      exactQuantile: Boolean = true): DataFrame = {
    val ex = exploded(shingled(docs, n, bandWidth))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang", "__band", "__s")
    val exdf = cached(ex.withColumn("__df", count(lit(1)).over(w)))
    val pctl =
      if (exactQuantile) round(percentile(col("__df"), lit(dfQuantile)), 6)
      else percentile_approx(col("__df"), lit(dfQuantile), lit(10000)).cast("double")
    val thr = exdf.select(col("lang"), col("__band"), col("__s"), col("__df")).distinct()
      .agg(greatest(lit(minDf.toDouble), floor(pctl)).as("__thr"))
    val kept = cached(exdf.crossJoin(broadcast(thr))
      .filter(col("__df") <= col("__thr")).drop("__df", "__thr"))
    jaccardFromKept(kept, tau)
  }

  /** Shingle explosion on the 64-bit hash: the self-join shuffle carries
    * 8-byte keys instead of ~n-word strings (collision odds ~2^-64 per
    * pair — the exact twin stays exact). */
  private def exploded(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), col("lang"), col("__band"),
      explode(transform(col("__sh"), s => xxhash64(s))).as("__s"))

  /** Jaccard stage over a pre-shingled relation — the shared-scan entry
    * point [[familiesPairs]] uses to feed several families from ONE
    * shingle pass. */
  private def ngramJaccardFrom(sh: DataFrame, tau: Double, maxDf: Int): DataFrame = {
    val ex = exploded(sh)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang", "__band", "__s")
    val kept = cached(ex.withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") <= maxDf).drop("__df"))
      // ONE shingling+cut pass feeds the per-doc sizes and both
      // self-join sides (unpersisted, the scan+shingle+window pipeline
      // ran 3×, which dominated the sf0.1 bench)
    jaccardFromKept(kept, tau)
  }

  /** L57: near-dup pair EXPLAIN — the operational "why did these two
    * documents pair" surface a dedup rollout owes its data owners: the
    * corpus's TOP verified pair (jaccard desc, id tie-break) together
    * with every informative shingle the verdict rests on (the df-cut
    * survivors both sides share) and each shingle's block document
    * frequency. Runs on RAW shingle text, not the scale path's xxhash64
    * — hashes explain nothing to a human, and the text is what the
    * ANSI oracle can compare. Cost: one shingle+cut pass (shared via
    * cache between the pair ranking and the explain join) — the output
    * is one pair's shingles, never corpus-sized. */
  def explainTopPair(docs: DataFrame, n: Int = 3, bandWidth: Int = 50,
      maxDf: Int = 128, tau: Double = 0.3): DataFrame = {
    val ex = shingled(docs, n, bandWidth)
      .select(col("doc_id"), col("lang"), col("__band"), explode(col("__sh")).as("__s"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang", "__band", "__s")
    val kept = cached(ex.withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") <= maxDf))
    val top = jaccardFromKept(kept, tau)
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id")).limit(1)
    top
      .join(kept.select(col("doc_id").as("a_id"), col("__s"), col("__df")), "a_id")
      .join(kept.select(col("doc_id").as("b_id"), col("__s")), Seq("b_id", "__s"))
      .select(col("a_id"), col("b_id"), col("jaccard"),
        col("__s").as("shingle"), col("__df").as("df"))
      .orderBy("shingle")
  }

  /** Intersection counts + set sizes + threshold over a df-cut shingle
    * relation (shared by the fixed and adaptive cuts). Pair generation
    * runs through the custom [[graft.plans.Pairs]] operator: one
    * clustering exchange on (lang, band, shingle) — which the df-cut
    * window has usually already established — instead of the two-sided
    * self-join shuffle. */
  private def jaccardFromKept(kept: DataFrame, tau: Double): DataFrame = {
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("__n"))
    val inter = graft.plans.Pairs.withinGroups(
        kept, Seq("lang", "__band", "__s"), "doc_id")
      .select(col("a_doc_id").as("a_id"), col("b_doc_id").as("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("__inter"))
    jaccardFromCounts(inter, sizes, tau)
  }

  private def jaccardFromCounts(inter: DataFrame, sizes: DataFrame, tau: Double): DataFrame = {
    val sa = sizes.select(col("doc_id").as("a_id"), col("__n").as("__na"))
    val sb = sizes.select(col("doc_id").as("b_id"), col("__n").as("__nb"))
    inter.join(sa, "a_id").join(sb, "b_id")
      .withColumn("jaccard",
        round(col("__inter").cast("double") /
          (col("__na") + col("__nb") - col("__inter")), 6))
      .filter(col("jaccard") >= tau)
      .select("a_id", "b_id", "jaccard")
  }

  /** MinHash modulus (shared with the native expression). */
  private val MhP = graft.plans.MinHashSignature.P

  /** MinHash + LSH near-dup pairs — the 100 TB scale path (L3).
    *
    * shingle → xxhash64 → k minhashes h_i = (a_i·x + b_i) mod 2^61-1 →
    * group r consecutive minhashes per band → candidates share a band
    * bucket inside a (lang, length-band) block → verify exact jaccard on
    * candidates only. Bucket join keys are (band index, bucket hash), so
    * the shuffle distributes over bands naturally (no quadratic blowup,
    * skew bounded by bucket width).
    */
  def minhashLshPairs(
      docs: DataFrame,
      n: Int = 3,
      k: Int = 63,
      rowsPerBand: Int = 3, // b=21,r=3: P(candidate|j=0.5)≈94%, j=0.95≈1;
                            // spurious-pair rate at j≈0 is ~1e-5·21 — r=2
                            // fires on ~8% of ALL block pairs (measured
                            // 15s of candidate verification at sf0.1)
      tau: Double = 0.3,
      bandWidth: Int = 50): DataFrame =
    minhashFrom(shingled(docs, n, bandWidth), k, rowsPerBand, tau)

  /** Band-bucket keyed rows (doc_id, lang, __band, __k): one row per
    * (doc, band), key = 64-bit hash of (band index, band's signature
    * rows). Expects the `__hx` column (shingle hashes mod P) on a
    * PERSISTED input — the k-signature computes in graft's native
    * codegen'd Expression (plans/MinHashSignature): one fused
    * primitive-long loop per row, O(1) expression-tree size in k. The
    * sigDf persist() is the materialization barrier that keeps the
    * band-key element_at references reading the computed array instead
    * of CollapseProject inlining the signature once per reference
    * (2·bands× recompute, measured at sf0.1). */
  private def minhashKeyed(sh: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    val bands = k / rowsPerBand
    val sigDf = cached(sh
      .select(col("doc_id"), col("lang"), col("__band"),
        graft.plans.GraftFunctions.minhashSignature(col("__hx"), k).as("__sig")))
    val bandKeys = transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b, xxhash64((0 until rowsPerBand).map(r =>
        element_at(col("__sig"), b * rowsPerBand + r + 1)): _*)))
    sigDf.select(col("doc_id"), col("lang"), col("__band"), explode(bandKeys).as("__k"))
  }

  /** Exact-jaccard verification of candidate pairs against the shingle
    * sets (shared by MinHash-LSH standalone and the families pass). */
  private def verifyJaccard(cands: DataFrame, sets: DataFrame, tau: Double): DataFrame =
    cands
      .join(sets.select(col("doc_id").as("a_id"), col("__sh").as("__sa")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("__sh").as("__sb")), "b_id")
      .withColumn("__inter", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("jaccard",
        round(col("__inter").cast("double") /
          (size(col("__sa")) + size(col("__sb")) - col("__inter")), 6))
      .filter(col("jaccard") >= tau)
      .select("a_id", "b_id", "jaccard")

  /** MinHash-LSH stage over a pre-shingled relation (see
    * [[ngramJaccardFrom]] for the shared-scan rationale). Candidate
    * pairs come from the custom pair operator over band buckets —
    * one exchange, no self-join. */
  private def minhashFrom(
      shingles: DataFrame,
      k: Int,
      rowsPerBand: Int,
      tau: Double): DataFrame = {
    val sh = cached(shingles
      .withColumn("__hx", transform(col("__sh"), s => pmod(xxhash64(s), lit(MhP))))) // feeds both the signature branch and the verify branch
    val cands = graft.plans.Pairs.withinGroups(
        minhashKeyed(sh, k, rowsPerBand), Seq("lang", "__band", "__k"), "doc_id")
      .select(col("a_doc_id").as("a_id"), col("b_doc_id").as("b_id")).distinct()
    verifyJaccard(cands, sh.select(col("doc_id"), col("__sh")), tau)
  }

  /** Engine-PORTABLE MinHash-LSH twin (L3b — the A14b pattern): the same
    * signature arithmetic ((a·x+b) mod 2^31−1, same native expression,
    * same banding) as [[minhashLshPairs]], but both hash ingredients are
    * md5-derived arithmetic that exists verbatim in ANSI SQL — the
    * shingle hash is first-8-hex-digits(md5(shingle)) mod P and the band
    * key is md5 of "bandIndex,h_i,h_i+1,h_i+2" — so the ENTIRE candidate
    * stage (signatures, banding, bucket join, exact-jaccard verify) is
    * DuckDB-oracle-exact, converting MinHash-LSH from rows-only to
    * hash-verified. The xxhash64 variant remains the cheaper scale path
    * (one codegen'd hash vs md5 + substring per shingle). */
  def minhashLshPairsPortable(
      docs: DataFrame,
      n: Int = 3,
      k: Int = 63,
      rowsPerBand: Int = 3,
      tau: Double = 0.3,
      bandWidth: Int = 50): DataFrame = {
    val sh = cached(shingled(docs, n, bandWidth)
      .withColumn("__hx", transform(col("__sh"), s =>
        pmod(conv(substring(md5(s), 1, 8), 16, 10).cast("long"), lit(MhP)))))
    val bands = k / rowsPerBand
    val sigDf = cached(sh
      .select(col("doc_id"), col("lang"), col("__band"),
        graft.plans.GraftFunctions.minhashSignature(col("__hx"), k).as("__sig"))) // materialization barrier — see minhashKeyed
    val bandKeys = transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat_ws(",", (b.cast("string") +: (0 until rowsPerBand).map(r =>
        element_at(col("__sig"), b * rowsPerBand + r + 1).cast("string"))): _*)))
    val keyed = sigDf.select(col("doc_id"), col("lang"), col("__band"),
      explode(bandKeys).as("__k"))
    val cands = graft.plans.Pairs.withinGroups(keyed, Seq("lang", "__band", "__k"), "doc_id")
      .select(col("a_doc_id").as("a_id"), col("b_doc_id").as("b_id")).distinct()
    verifyJaccard(cands, sh.select(col("doc_id"), col("__sh")), tau)
  }

  /** SimHash chunk-keyed rows (doc_id, lang, __band, __sig, __k): four
    * rows per doc, key = chunk index × 2^16 + the chunk's 16 bits. */
  private def simhashChunks(docs: DataFrame, bandWidth: Int): DataFrame =
    simhashChunksFrom(scatter(blockCols(docs, bandWidth))
      .select(col("doc_id"), col("lang"), col("__band"),
        // weighted (Charikar) simhash: token multiplicity contributes,
        // which separates documents drawn from a shared small vocabulary
        transform(Text.tokens(col("text")), t => xxhash64(t)).as("__th")))

  /** Signature fold + chunk explosion over a pre-hashed token relation
    * (doc_id, lang, __band, __th: array<bigint>) — shared by the
    * xxhash64 operator and the engine-portable twin. */
  private def simhashChunksFrom(toks: DataFrame): DataFrame = {
    // bit j of the signature = sign of sum over tokens of ±1 on bit j;
    // the whole 64-bit signature folds in ONE nested expression
    val packed = toks.withColumn("__sig",
      aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, j) =>
        acc.bitwiseOR(call_function("shiftleft",
          when(aggregate(col("__th"), lit(0L), (s, h) =>
            s + when(call_function("shiftright", h, j.cast("int")).bitwiseAND(1L) === 1L, 1L)
              .otherwise(-1L)) > 0,
            1L).otherwise(0L),
          j.cast("int")))))
      .select("doc_id", "lang", "__band", "__sig")
    val packedCached = cached(packed) // the chunk explode scans it 4×
    packedCached.select(col("doc_id"), col("lang"), col("__band"), col("__sig"),
      explode(array((0 until 4).map(c =>
        shiftright(col("__sig"), c * 16).bitwiseAND(0xFFFFL) + lit(c.toLong << 16)): _*)).as("__k"))
  }

  /** SimHash near-dup pairs (L4): 64-bit signature from token hashes,
    * candidates share one of four 16-bit chunks (within a block), verify
    * hamming distance ≤ maxHamming. The signature rides through the pair
    * operator as a payload, so verification needs no join back. */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int = 6,
      bandWidth: Int = 50): DataFrame =
    simhashFromChunks(simhashChunks(docs, bandWidth), maxHamming)

  /** Engine-PORTABLE SimHash twin (L4b — the A14b/L3b pattern): the same
    * weighted Charikar bit-fold and 16-bit chunk banding as
    * [[simhashPairs]], with the token hash swapped for the md5-derived
    * 60-bit value (first 15 hex digits) both engines compute
    * identically. Signature bits 60–63 are constant zero on BOTH sides,
    * so hamming distances are unaffected; the DuckDB oracle mirrors the
    * bit-fold, chunk keys and xor-popcount verification exactly,
    * converting SimHash candidate generation from rows-only to
    * hash-verified. xxhash64 (L4) stays the cheaper scale path. */
  def simhashPairsPortable(
      docs: DataFrame,
      maxHamming: Int = 6,
      bandWidth: Int = 50): DataFrame =
    simhashFromChunks(simhashChunksFrom(
      scatter(blockCols(docs, bandWidth))
        .select(col("doc_id"), col("lang"), col("__band"),
          transform(Text.tokens(col("text")), t =>
            conv(substring(md5(t), 1, 15), 16, 10).cast("long")).as("__th"))),
      maxHamming)

  private def simhashFromChunks(chunks: DataFrame, maxHamming: Int): DataFrame =
    graft.plans.Pairs.withinGroups(
        chunks, Seq("lang", "__band", "__k"), "doc_id", payloadCols = Seq("__sig"))
      .select(col("a_doc_id").as("a_id"), col("b_doc_id").as("b_id"),
        bit_count(col("a___sig").bitwiseXOR(col("b___sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)

  /** All near-dup families from ONE shared pass (L2+L3+L4): the scan,
    * blocking, tokenization, and shingling run once (persisted), and the
    * MinHash + SimHash families' candidate generation shares ONE
    * clustering exchange — their keyed rows (band-bucket hash / chunk,
    * tagged by family) union into a single [[graft.plans.Pairs]] call
    * whose output (thin candidate pairs) is what gets materialized.
    *
    * The jaccard family deliberately stays OUTSIDE the shared exchange:
    * its pair stream is the FAT intermediate (every co-occurring shingle
    * emits a row that map-side combine immediately collapses into
    * intersection counts), and routing it through the shared exchange
    * forces materializing that stream for the fan-out — measured 1.5×
    * slower at sf0.1 than letting it flow straight into partial
    * aggregation. Inline it also adds no exchange of its own: the pair
    * operator reuses the df-cut window's (lang, band, shingle)
    * partitioning. Net exchanges for candidate generation: 1 shared
    * (mh+sim) + 0 (jac) vs the self-join era's 6.
    *
    * Returns (family, a_id, b_id, score) where score is the family's
    * native measure (jaccard, estimated jaccard, 64−hamming). Each
    * family's pair set is IDENTICAL to its standalone operator
    * (spec-pinned). */
  def familiesPairs(
      docs: DataFrame,
      n: Int = 3,
      tau: Double = 0.3,
      bandWidth: Int = 50,
      maxDf: Int = 128,
      k: Int = 63,
      rowsPerBand: Int = 3,
      maxHamming: Int = 6): DataFrame = {
    val sh = cached(shingled(docs, n, bandWidth))
    // jaccard: pair stream consumed inline by the intersection aggregate
    val jac = ngramJaccardFrom(sh, tau, maxDf)
      .select(lit("jaccard").as("family"), col("a_id"), col("b_id"),
        col("jaccard").as("score"))
    // minhash + simhash: thin candidate pairs from ONE shared exchange
    val shx = cached(sh.withColumn("__hx", transform(col("__sh"), s => pmod(xxhash64(s), lit(MhP)))))
    val mhKeyed = minhashKeyed(shx, k, rowsPerBand)
      .select(lit("mh").as("__fam"), col("lang"), col("__band"), col("__k"),
        col("doc_id"), lit(0L).as("__sig"))
    val simKeyed = simhashChunks(docs, bandWidth)
      .select(lit("sim").as("__fam"), col("lang"), col("__band"), col("__k"),
        col("doc_id"), col("__sig"))
    val thinPairs = cached(graft.plans.Pairs.withinGroups(
        mhKeyed.unionByName(simKeyed),
        Seq("__fam", "lang", "__band", "__k"), "doc_id", payloadCols = Seq("__sig"))
      ) // thin: candidates only, fanned out to both post-passes
    val mhCands = thinPairs.filter(col("__fam") === "mh")
      .select(col("a_doc_id").as("a_id"), col("b_doc_id").as("b_id")).distinct()
    val mh = verifyJaccard(mhCands, shx.select(col("doc_id"), col("__sh")), tau)
      .select(lit("minhash").as("family"), col("a_id"), col("b_id"),
        col("jaccard").as("score"))
    val simh = thinPairs.filter(col("__fam") === "sim")
      .select(col("a_doc_id").as("a_id"), col("b_doc_id").as("b_id"),
        bit_count(col("a___sig").bitwiseXOR(col("b___sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .select(lit("simhash").as("family"), col("a_id"), col("b_id"),
        (lit(64) - col("hamming")).cast("double").as("score"))
    jac.unionByName(mh).unionByName(simh)
  }

  /** All three near-dup families, ENGINE-PORTABLE (L14b — the
    * oracle-exact twin of [[familiesPairs]]): the jaccard family is
    * already ANSI-expressible, and the minhash/simhash families use
    * their portable twins (L3b/L4b), so the ENTIRE three-family output
    * — candidates, verification, scores — is DuckDB-verifiable. This
    * composes the standalone operators rather than sharing one scan:
    * it is the VERIFICATION surface; the xxhash64 shared-pass operator
    * remains the scale path (one exchange across families). Output
    * schema matches [[familiesPairs]]: (family, a_id, b_id, score). */
  def familiesPairsPortable(
      docs: DataFrame,
      n: Int = 3,
      tau: Double = 0.3,
      bandWidth: Int = 50,
      maxDf: Int = 128,
      k: Int = 63,
      rowsPerBand: Int = 3,
      maxHamming: Int = 6): DataFrame =
    ngramJaccardPairs(docs, n, tau, bandWidth, maxDf)
      .select(lit("jaccard").as("family"), col("a_id"), col("b_id"),
        col("jaccard").cast("double").as("score"))
      .unionByName(minhashLshPairsPortable(docs, n, k, rowsPerBand, tau, bandWidth)
        .select(lit("minhash").as("family"), col("a_id"), col("b_id"),
          col("jaccard").cast("double").as("score")))
      .unionByName(simhashPairsPortable(docs, maxHamming, bandWidth)
        .select(lit("simhash").as("family"), col("a_id"), col("b_id"),
          (lit(64) - col("hamming")).cast("double").as("score")))

  /** Near-dup clusters from a pair relation (L16): connected components
    * over the undirected pair graph, labeling every member with the
    * minimum doc_id reachable from it — the canonical representative a
    * curation pipeline keeps (`keep` marks it). Iterative min-label
    * propagation: each round joins edge endpoints to current labels and
    * takes the per-node min, converging in graph-diameter rounds.
    * Near-dup graphs are unions of small dense cliques (copies of the
    * same content), so the diameter is tiny; each round is two linear
    * shuffles on the node id, nothing quadratic. For adversarial
    * long-chain graphs the O(log n)-round large-star/small-star
    * variant is the drop-in upgrade; the convergence guard throws
    * rather than returning a partial labeling. The only driver-side
    * value per round is the changed-label count (one scalar). */
  /** Per-round lineage truncation for the iterative clusterers: persist
    * alone leaves each round's logical plan nesting the previous one's
    * and Catalyst analysis time grows exponentially with rounds. Local
    * checkpoint (executor-block storage) is the single-box default; pass
    * `checkpointDir` for a RELIABLE checkpoint to shared storage — on a
    * real cluster localCheckpoint ties the RDD to specific executors, so
    * one lost executor past round 1 fails the job, while a reliable
    * checkpoint survives executor loss (the knob a 1000-executor run
    * must set). */
  private def lineageTruncator(
      like: DataFrame,
      checkpointDir: Option[String]): DataFrame => DataFrame = checkpointDir match {
    case Some(dir) =>
      like.sparkSession.sparkContext.setCheckpointDir(dir)
      df => df.checkpoint(eager = true)
    case None =>
      df => df.localCheckpoint(eager = true)
  }

  /** Free the block storage behind a DISCARDED eagerly-checkpointed
    * round result. `Dataset.unpersist` only drops CacheManager entries;
    * a local checkpoint lives on as a persisted RDD until the
    * ContextCleaner happens to collect it, so a many-round clustering
    * accumulates every round's shuffle-sized blocks and the resulting
    * memory/GC pressure lands on NEIGHBORING queries (bench signature:
    * dedup_minhash_lsh 1.68 s following the clusterer vs 1.14 s
    * isolated). Safe ONLY for round results nothing references anymore —
    * the lineage is truncated, so freed blocks cannot be recomputed.
    * Reliable (file) checkpoints have no blocks to free. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  def clusters(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    val truncate = lineageTruncator(pairs, checkpointDir)
    // the input pair PIPELINE (often a full near-dup candidate pass) is
    // referenced twice by the symmetric union — cache the thin pair set
    // so the expensive upstream runs once, not per orientation
    val p = cached(pairs.select(col(aCol), col(bCol)))
    val edges = cached(p.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(p.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct())
    // labels only ever DECREASE under min-propagation, so the fixpoint
    // test is one scalar: the label sum is strictly monotone until
    // convergence — no per-round diff join needed (decimal sum: no
    // overflow however many ids, exact comparison)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).collect()(0).getDecimal(0)
    var labels = cached(edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")))
    if (labels.isEmpty)
      return labels.select(col("id").as("doc_id"), col("label").as("cluster_id"),
        lit(true).as("keep"))
    var curSum = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val neighbor = edges
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .select(col("src").as("id"), col("label"))
      // (pointer jumping — adopting the label of one's label for
      // O(log diameter) rounds — was measured SLOWER here: near-dup
      // graphs are shallow cliques, so the extra per-round self-join
      // costs more than the rounds it saves; revisit only for corpora
      // with long chain diameters)
      // eager lineage truncation, not just persist: each round's plan
      // otherwise nests the previous round's and analysis time grows
      // with the iteration count (see clustersAltStar)
      val next = truncate(labels.unionByName(neighbor)
        .groupBy("id").agg(min("label").as("label")))
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(curSum) == 0
      curSum = nextSum
      graft.OperatorCache.release(labels)
      freeCheckpoint(labels) // next is already materialized — safe to drop
      labels = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(s"label propagation did not converge in $maxIter rounds")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"),
      (col("id") === col("label")).as("keep"))
  }

  /** Connected components by alternating large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the O(log n)-round companion to [[clusters]] for pair graphs with
    * LONG CHAINS (templated/serially-edited content), where per-round
    * min-label propagation needs diameter rounds. Each round rewires
    * every node's neighborhood onto its local minimum, halving the
    * effective depth; edges are kept canonically as (hi, lo) and
    * convergence is an order-independent set fingerprint
    * (count + bit_xor of edge hashes) — one 2-scalar aggregate per
    * round on the driver, like [[clusters]]' label sum. Output schema
    * and labels are identical to [[clusters]] (spec-pinned). */
  def clustersAltStar(
      pairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    val truncate = lineageTruncator(pairs, checkpointDir)
    // see clusters(): cache the thin pair set — nodes + the canonical
    // edge orientation reference the input pipeline three times
    val p = cached(pairs.select(col(aCol), col(bCol)))
    val nodes = cached(p.select(col(aCol).as("n")).unionByName(p.select(col(bCol).as("n")))
      .distinct())
    // canonical orientation hi→lo (the component minimum only ever
    // appears on the lo side, so stars emerge as (member, min) edges).
    // Each round's result is EAGERLY lineage-truncated — see
    // [[lineageTruncator]] for the local vs reliable checkpoint trade.
    var edges = truncate(p
      .filter(col(aCol) =!= col(bCol))
      .select(greatest(col(aCol), col(bCol)).as("hi"), least(col(aCol), col(bCol)).as("lo"))
      .distinct())
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("hi"), col("lo"))), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var fp = fingerprint(edges)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // LARGE-STAR: every node u links its LARGER neighbors to
      // m(u) = min(Γ(u) ∪ {u}); emitted edges always run hi→lo
      val nbrs = edges.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mins = nbrs.groupBy("u").agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("__mn"), col("u")).as("m"))
      val afterLarge = truncate(nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .unionByName(mins.filter(col("u") =!= col("m"))
          .select(col("u").as("hi"), col("m").as("lo")))
        .distinct())
      // SMALL-STAR: every node u links its SMALLER-or-equal
      // neighborhood (incl. itself) to the minimum among them
      val minsS = afterLarge.groupBy("hi").agg(min(col("lo")).as("m"))
      val next = truncate(afterLarge.join(minsS, "hi")
        .filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .unionByName(minsS.select(col("hi"), col("m").as("lo")))
        .distinct())
      afterLarge.unpersist()
      freeCheckpoint(afterLarge) // next is materialized — nothing needs it
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      edges.unpersist()
      freeCheckpoint(edges)
      edges = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(s"alternating star did not converge in $maxIter rounds")
    nodes.join(edges.select(col("hi").as("n"), col("lo").as("label")), Seq("n"), "left")
      .groupBy("n").agg(coalesce(min(col("label")), first(col("n"))).as("cluster_id"))
      .select(col("n").as("doc_id"), col("cluster_id"),
        (col("n") === col("cluster_id")).as("keep"))
  }

  /** Containment near-dup pairs (L24): |A∩B| / min(|A|,|B|) ≥ tau — the
    * ASYMMETRIC companion to jaccard, for quote/subset detection: a
    * short document wholly contained in a long one scores 1.0 where its
    * jaccard is near zero. Deliberately NOT length-band-blocked —
    * containment pairs cross length bands by nature — so the
    * document-frequency cut is the only candidate bound (and the pair
    * operator's per-key skew guard is the backstop). Still per-language
    * blocked: containment across languages is not meaningful for text. */
  def containmentPairs(
      docs: DataFrame,
      n: Int = 3,
      tau: Double = 0.6,
      maxDf: Int = 128): DataFrame = {
    val ex = scatter(docs.filter(size(Text.tokens(col("text"))) >= n))
      .select(col("doc_id"), col("lang"),
        explode(transform(Text.wordShingles(col("text"), n), s => xxhash64(s))).as("__s"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang", "__s")
    val kept = cached(ex.withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") <= maxDf).drop("__df"))
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("__n"))
    val inter = graft.plans.Pairs.withinGroups(kept, Seq("lang", "__s"), "doc_id")
      .select(col("a_doc_id").as("a_id"), col("b_doc_id").as("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("__n").as("__na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("__n").as("__nb")), "b_id")
      .withColumn("containment",
        round(col("__inter").cast("double") / least(col("__na"), col("__nb")), 6))
      .filter(col("containment") >= tau)
      .select("a_id", "b_id", "containment")
  }

  /** Cross-corpus near-dup pairs (L22): an incoming batch vs an existing
    * corpus, emitting CROSS-SIDE pairs only — the incremental-ingest
    * shape of dedup. Corpus-internal pairs were found when the corpus
    * was built and batch-internal pairs come from the regular operator,
    * so at 100 TB each ingest pays O(batch) pairing work against the
    * corpus's keyed shingles, never re-pairing the corpus with itself.
    *
    * This one is a genuine two-relation equi-join (the self-join
    * degeneracy [[graft.plans.Pairs]] removes does not arise): the small
    * batch side streams against the corpus side on (lang, band, shingle).
    * The document-frequency cut is computed over corpus ∪ batch so the
    * "informative shingle" semantics match running [[ngramJaccardPairs]]
    * on the combined corpus (and the DuckDB oracle mirrors exactly);
    * per-doc set sizes are likewise df-cut. Output: (corpus_id,
    * batch_id, jaccard). */
  def crossCorpusPairs(
      corpus: DataFrame,
      batch: DataFrame,
      n: Int = 3,
      tau: Double = 0.3,
      bandWidth: Int = 50,
      maxDf: Int = 128): DataFrame = {
    val tagged = shingled(corpus.withColumn("__side", lit("c"))
        .unionByName(batch.withColumn("__side", lit("b"))), n, bandWidth)
    // shingled() carries (doc_id, lang, __band, __sh); re-attach side
    // via the id (ids are unique across sides in a managed corpus)
    val sides = corpus.select(col("doc_id"), lit("c").as("__side"))
      .unionByName(batch.select(col("doc_id"), lit("b").as("__side")))
    val ex = exploded(tagged).join(sides, "doc_id")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang", "__band", "__s")
    val kept = cached(ex.withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") <= maxDf).drop("__df"))
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("__n"))
    val a = kept.filter(col("__side") === "c")
      .select(col("doc_id").as("a_id"), col("lang"), col("__band"), col("__s"))
    val b = kept.filter(col("__side") === "b")
      .select(col("doc_id").as("b_id"), col("lang").as("__lb"),
        col("__band").as("__bb"), col("__s").as("__sb"))
    val inter = a.join(b,
        col("__s") === col("__sb") && col("lang") === col("__lb") &&
          col("__band") === col("__bb"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("__inter"))
    jaccardFromCounts(inter, sizes, tau)
  }

  /** Incremental connected components (L16c): fold a batch of NEW pairs
    * into an existing labeling WITHOUT revisiting the original pair set.
    *
    * Two facts make this exact, not approximate:
    *  1. A labeling is a connectivity-equivalent summary of the pairs
    *     that produced it — the star edges (member → cluster min) have
    *     the same components as the original graph — so clustering
    *     (labeling-as-edges ∪ new pairs) equals clustering
    *     (old pairs ∪ new pairs). The old pair set (quadratic-ish in
    *     cluster sizes) is replaced by one edge per member.
    *  2. New pairs can only change components they TOUCH. Components
    *     reachable from a new-pair endpoint are isolated with two
    *     semi-joins; everything else passes through unchanged.
    *
    * Cost: two linear semi-joins over the labeling + a clustering run
    * over (affected members + new pairs) — at 100 TB, a daily near-dup
    * delta re-clusters only the handful of components it touches, not
    * the corpus history. Docs never seen before enter as new nodes.
    * Spec pins equality with a full rebuild, including batches that
    * MERGE previously separate clusters. */
  def clustersIncremental(
      labeling: DataFrame,
      newPairs: DataFrame,
      aCol: String = "a_id",
      bCol: String = "b_id",
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    val touched = newPairs.select(col(aCol).as("doc_id"))
      .unionByName(newPairs.select(col(bCol).as("doc_id"))).distinct()
    // clusters whose any member is an endpoint of a new pair
    val affectedClusters = labeling.join(touched, Seq("doc_id"), "left_semi")
      .select(col("cluster_id")).distinct()
    val affected = cached(labeling.join(affectedClusters, Seq("cluster_id"), "left_semi"))
    val unaffected = labeling.join(affectedClusters, Seq("cluster_id"), "left_anti")
    // star edges of the affected components stand in for their history
    val starEdges = affected.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(aCol), col("cluster_id").as(bCol))
    val reclustered = clustersAltStar(
      starEdges.unionByName(newPairs.select(col(aCol), col(bCol))),
      aCol, bCol, maxIter, checkpointDir)
    // a doc whose cluster was a singleton has no star edge; if it also
    // gained no new pair it must survive as its own cluster
    val singletons = affected
      .join(reclustered.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"), lit(true).as("keep"))
    unaffected.select("doc_id", "cluster_id", "keep")
      .unionByName(reclustered).unionByName(singletons)
  }

  /** Embedding near-dup pairs (L5): cosine ≥ tau within a block column
    * (here: label). The block join is the candidate bound; cosine is the
    * fixed-order double fold from [[Vectors]]. */
  def embeddingPairs(
      embeddings: DataFrame,
      tau: Double = 0.35,
      blockCol: String = "label"): DataFrame = {
    val e = embeddings.select(col("vec_id"), col(blockCol).as("__blk"),
      Vectors.toDouble(col("embedding")).as("__v"))
    graft.plans.Pairs.withinGroups(e, Seq("__blk"), "vec_id", payloadCols = Seq("__v"))
      .select(col("a_vec_id").as("a_id"), col("b_vec_id").as("b_id"),
        Vectors.cosine6(col("a___v"), col("b___v")).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** L34: semantic deduplication (SemDeDup — Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"; no reference analogue — a beyond-reference
    * training-data operator): cluster the embedding space with the
    * portable coarse quantizer, search duplicate pairs ONLY within a
    * cluster, and inside each duplicate relation keep the example
    * farthest from its cluster seed (the paper's low-similarity-to-
    * centroid keep rule — edge examples carry more signal).
    *
    * The keep rule is dominance-based, the distributed form of the
    * paper's per-group greedy: a vector is dropped iff SOME same-cluster
    * vector with cosine ≥ tau precedes it in the total order
    * (seed distance desc, vec_id asc). One pass over the pair stream —
    * no iteration, deterministic in any engine (the distance is the
    * quantizer's exact integer, cosine is the 6-dp fixed fold, and the
    * order has no ties left).
    *
    * Scale (100 TB): nClusters grows with the corpus (SemDeDup runs
    * ~50k clusters on LAION) so per-cluster candidate sets stay bounded
    * — the pair search partitions by cluster through the same
    * [[graft.plans.Pairs]] plan as every other family, maxGroupRows
    * turning a degenerate cluster into a named error instead of an
    * executor OOM. Everything downstream of the pair stream is one
    * distinct + one anti-join on vec_id. */
  def semanticDedup(
      embeddings: DataFrame,
      nClusters: Int = 8,
      tau: Double = 0.2): DataFrame = {
    val assigned = cached(
      graft.similarity.Ann.portableAssignmentsDetailed(embeddings, nClusters))
    val pairs = graft.plans.Pairs.withinGroups(
        assigned, Seq("cl"), "vec_id", payloadCols = Seq("__v", "__dc"))
      .filter(Vectors.cosine6(col("a___v"), col("b___v")) >= tau)
    // exactly one side of each duplicate pair is preferred (larger seed
    // distance, then smaller id — ids in a pair always differ)
    val dropped = pairs.select(
        when(col("b___dc") > col("a___dc") ||
            (col("b___dc") === col("a___dc") && col("b_vec_id") < col("a_vec_id")),
          col("a_vec_id")).otherwise(col("b_vec_id")).as("vec_id"))
      .distinct()
    assigned.join(dropped.withColumn("__drop", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cl"), col("__drop").isNull.as("kept"))
  }

  /** L32: exact substring-duplication stats — the distributed form of
    * suffix-array substring dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better"; no reference analogue
    * — a beyond-reference training-data operator).
    *
    * Every k-token window of every document is hashed; a window whose
    * hash occurs in ≥ 2 distinct documents marks its start position, and
    * marked windows whose spans overlap or touch (start gap ≤ k) merge
    * into maximal duplicated spans via gap-and-islands over positions.
    * Per document: window/span counts, duplicated token count and
    * fraction — the inputs to span-drop or doc-drop policies.
    *
    * Scale (100 TB): windows are O(total tokens) thin rows
    * (doc_id, pos, hash) — never the window text itself past the map
    * side; the duplicate test is one linear hash aggregation with
    * map-side combine (hot boilerplate windows collapse to one partial
    * per task); the flag-back is a semi-shaped inner join on the same
    * key whose output is bounded by the true marked positions; span
    * merging windows over doc_id — document-sized partitions, never
    * skewed. No stage materializes more than O(total tokens) rows.
    *
    * `hash64 = true` (default) keys windows by 8-byte xxhash64 — the
    * cluster-scale choice (half the shuffle width of md5, no hex
    * strings). `false` keys by md5 hex, which DuckDB mirrors exactly —
    * the driver oracle runs against this engine output unchanged
    * because the result carries no hash values: the two paths agree
    * unless a 64-bit collision falsely marks a window (birthday odds
    * ~1e-4 at 10^8 windows; DedupAnnSpec pins exact equality of both
    * paths on the test corpus). */
  /** Shared L32/L47 front half: tokenized docs + maximal duplicated
    * spans (doc_id, __island, __s, __e, __nw) — window positions whose
    * k-token hash occurs in ≥ 2 distinct docs, merged gap-and-islands.
    * See [[substringDupStats]] for the full scale/correctness notes. */
  private def substringSpans(docs: DataFrame, k: Int, hash64: Boolean): (DataFrame, DataFrame) = {
    require(k >= 2, s"window size must be >= 2, got $k")
    val hashOf: Column => Column = if (hash64) xxhash64(_) else md5(_)
    val toksed = docs.select(col("doc_id"),
      size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
      Text.tokens(col("text")).as("__toks"))
    val wins = cached(scatter(toksed.filter(col("n_tokens") >= k))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("__toks")) - (k - 1)),
          i => hashOf(concat_ws(" ", slice(col("__toks"), i, lit(k)))))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("__h")))
    val dup = wins.groupBy("__h")
      .agg(count_distinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= 2).select("__h")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val spans = wins.join(dup, "__h").select("doc_id", "pos")
      .withColumn("__brk", when(col("pos") - lag("pos", 1).over(w) <= k, 0).otherwise(1))
      .withColumn("__island", sum("__brk").over(w))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min("pos").as("__s"), max("pos").as("__e"), count(lit(1)).as("__nw"))
    (toksed, spans)
  }

  def substringDupStats(docs: DataFrame, k: Int = 8, hash64: Boolean = true): DataFrame = {
    val (toksed, spans) = substringSpans(docs, k, hash64)
    val perDoc = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("__nspans"), sum("__nw").as("__dw"),
        sum(col("__e") - col("__s") + lit(k)).as("__dt"))
    // the per-doc frame needs only (doc_id, n_tokens) — cache that slim
    // projection rather than re-scanning + re-tokenizing the corpus a
    // second time for the final join
    val counts = cached(toksed.select(col("doc_id"), col("n_tokens")))
    counts.select(col("doc_id"), col("n_tokens"),
        greatest(col("n_tokens") - (k - 1), lit(0L)).as("n_windows"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        coalesce(col("__dw"), lit(0L)).as("dup_windows"),
        coalesce(col("__nspans"), lit(0L)).as("n_spans"),
        coalesce(col("__dt"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("__dt"), lit(0L)).cast("double") / col("n_tokens"), 6)
          .as("dup_frac"))
  }

  /** L47: duplicated-span REMOVAL — the action L32's stats inform (the
    * Lee et al. 2021 span-cut policy): every token inside a maximal
    * duplicated span ([__s, __e + k − 1] in token positions) is cut and
    * the document is re-emitted clean. Shares [[substringSpans]]'s
    * front half, so the cost profile is L32's; the cut itself is
    * scan-side array algebra after ONE left join of the per-doc span
    * list (spans per doc are few — bounded by n_tokens/k — so the
    * collected span array is document-sized, never corpus-sized).
    * Span-free documents pass through with their tokens rejoined
    * (whitespace-normalized, the tokenizer's contract). Same
    * hash64/md5 dual as L32: output carries no hash values, so the md5
    * oracle verifies the xxhash64 scale path unchanged. */
  def removeDupSpans(docs: DataFrame, k: Int = 8, hash64: Boolean = true): DataFrame = {
    val (toksed, spans) = substringSpans(docs, k, hash64)
    val spanArr = spans.groupBy("doc_id")
      .agg(collect_list(struct(col("__s").as("s"), (col("__e") + (k - 1)).as("t"))).as("__spans"))
    val idx = transform(sequence(lit(1), size(col("__toks"))),
      i => struct(i.as("p"), element_at(col("__toks"), i).as("tk")))
    val kept = filter(idx, s => !exists(col("__spans"),
      sp => s.getField("p") >= sp.getField("s") && s.getField("p") <= sp.getField("t")))
    toksed.join(spanArr, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(col("__spans").isNull, lit(0L))
          .otherwise(col("n_tokens") - size(kept)).as("removed_tokens"),
        when(col("__spans").isNull, concat_ws(" ", col("__toks")))
          .otherwise(concat_ws(" ", transform(kept, s => s.getField("tk"))))
          .as("clean_text"))
  }

  /** L40: cluster-canonical selection by QUALITY — the same connected
    * components as [[clustersAltStar]], but the kept representative per
    * cluster is the member with the highest English-stopword ratio
    * (most natural-language text), tie-broken to the smallest doc_id —
    * the keep-the-best policy real dedup pipelines use instead of
    * keep-the-min-id. The policy is a per-cluster window argmax over
    * the tiny labeled set; the expensive pair/label work is unchanged
    * and shared, so the 100 TB cost profile is identical to the base
    * clusterer. */
  /** L41: leakage-safe train/val/test split — the assignment hashes the
    * near-dup CLUSTER, not the document, so near-duplicates can never
    * straddle train and test (the contamination vector a doc-level
    * random split leaves open; cf. the dedup literature's
    * train/test-overlap findings). Docs with no near-dup pair are their
    * own singleton cluster (left join + coalesce). The hash is the
    * portable md5 bucket of A14b, so the assignment is engine-exact,
    * stable under re-runs, and ADDITIVE: new corpus batches join an
    * existing cluster's split or hash a fresh one — no global shuffle
    * of prior assignments. Cost profile = the base clusterer (shared
    * pair/label work) + one corpus-scale hash projection. */
  def clusterSafeSplit(docs: DataFrame, testPct: Int = 10, valPct: Int = 10): DataFrame = {
    require(testPct >= 0 && valPct >= 0 && testPct + valPct <= 100, "bad split fractions")
    val labeled = clustersAltStar(ngramJaccardPairs(docs)).select("doc_id", "cluster_id")
    val lab = docs.select(col("doc_id"))
      .join(labeled, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val key = conv(substring(md5(col("cluster_id").cast("string")), 1, 8), 16, 10).cast("long")
    lab.withColumn("__b", pmod(key, lit(100L)))
      .select(col("doc_id"), col("cluster_id"),
        when(col("__b") < testPct, "test")
          .when(col("__b") < testPct + valPct, "val")
          .otherwise("train").as("split"))
      .orderBy("doc_id")
  }

  def clustersQualityKeeper(docs: DataFrame): DataFrame = {
    val labeled = clustersAltStar(ngramJaccardPairs(docs)).select("doc_id", "cluster_id")
    val toks = split(col("text"), " ")
    val en = typedLit(graft.functions.Text.Stopwords.toMap.apply("en"))
    val score = round(
      size(org.apache.spark.sql.functions.filter(toks, t => array_contains(en, t)))
        .cast("double") / size(toks), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("quality_score").desc, col("doc_id"))
    labeled.join(docs.select(col("doc_id"), score.as("quality_score")), "doc_id")
      .withColumn("__rn", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"), col("quality_score"),
        (col("__rn") === 1).as("keep"))
      .orderBy("doc_id")
  }

  /** L67: reuse-by-source report — the "which sources can I trust"
    * rollup a curator reads next to the lexical profile (L62) before
    * weighting a mixture: per source, how much of its content is
    * REUSED (paragraph occurrences that lose the corpus-wide
    * [[paragraphDedup]] winner rule — i.e. what fraction paragraph
    * dedup would delete from this source) and how much it OVERLAPS the
    * rest of the corpus (distinct paragraph contents that also appear
    * in another source — mirror/scrape detection). Granularity is the
    * paragraph because that is where real corpora duplicate (this one
    * included: zero whole-doc duplicates, 59 duplicated paragraphs at
    * sf0.01); a very large `para` degrades gracefully to whole-doc
    * rates. Ratios are exact floor-integer micros.
    *
    * Scale: content keys are 128-bit hashes, never text (L1's
    * discipline); the winner aggregate and per-content source counts
    * are map-side combined; everything downstream is keyed joins and
    * per-source rollups over O(distinct paragraphs). */
  def dedupRateBySource(docs: DataFrame, para: Int = 20): DataFrame = {
    val toks = split(col("text"), " ")
    val nP = when(size(toks) <= para, lit(1))
      .otherwise(ceil(size(toks).cast("double") / para).cast("int"))
    // ONE paragraph-explode pass feeds the winner aggregate, the
    // occurrence join-back AND the per-source content relation (three
    // consumers — uncached, the tokenize+explode+hash pipeline runs
    // three times); perSrcContent likewise feeds its df rollup and the
    // shared join
    val paras = cached(docs.filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"), toks.as("__toks"), nP.as("__np"))
      .select(col("source"), col("doc_id"),
        posexplode(transform(sequence(lit(0), col("__np") - 1),
          i => array_join(slice(col("__toks"), i * para + 1, lit(para)), " "))))
      .select(col("source"), col("doc_id"), col("pos").cast("int").as("para_idx"),
        md5(col("col")).as("__h")))
    val winners = paras.groupBy("__h")
      .agg(min(struct(col("doc_id"), col("para_idx"))).as("__w"))
    val occ = paras.join(winners, Seq("__h"))
      .withColumn("__dup",
        !(col("doc_id") === col("__w.doc_id") && col("para_idx") === col("__w.para_idx")))
    val perSrcContent = cached(paras.select("source", "__h").distinct())
    val bySources = perSrcContent.groupBy("__h").agg(count(lit(1)).as("__ns"))
    val shared = perSrcContent.join(bySources, Seq("__h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col("__ns") > 1, 1L).otherwise(0L)).as("n_shared"))
    occ.groupBy("source")
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup"))
      .join(shared, Seq("source"))
      .select(col("source"), col("n_paras"), col("n_dup"),
        expr("n_dup * 1000000 div n_paras").as("dup_micros"),
        col("n_distinct"), col("n_shared"),
        expr("n_shared * 1000000 div n_distinct").as("shared_micros"))
      .orderBy("source")
  }

  /** L68: document NOVELTY scores — the per-document inverse of the
    * boilerplate story (L30 strips what is common; this measures what
    * is NOT): the fraction of a document's distinct word-n-gram
    * shingles that appear NOWHERE else in the corpus. High novelty =
    * original content worth keeping; near-zero novelty = assembled
    * from corpus-common material (template/spam signal) even when no
    * single near-dup partner exists — the case pairwise dedup cannot
    * see. Corpus-wide document frequency (unblocked — novelty is a
    * global property), computed on 128-bit shingle hashes, never
    * shingle text. NO join-back to the occurrence relation: a df==1
    * shingle has exactly ONE owner, so the same df aggregate that
    * counts it can carry min(doc_id) and unique counts roll up from
    * the (distinct-shingle-sized) aggregate directly — the r9 plan
    * paid a second shingle-scale exchange shipping every occurrence
    * through a join on the hash; this one's only full-width exchange
    * is the map-side-combined df aggregate itself. Per-doc totals are
    * a second combine-to-tiny rollup of the same occurrences. Docs
    * too short to shingle (< n tokens) are absent — no evidence
    * either way, the L15 convention. */
  def noveltyScores(docs: DataFrame, n: Int = 3): DataFrame = {
    // ONE shingle pass feeds the df rollup and the per-doc totals
    // (uncached, the tokenize+shingle+hash pipeline runs twice)
    val sh = cached(scatter(docs.filter(col("text").isNotNull)
        .filter(size(Text.tokens(col("text"))) >= n))
      .select(col("doc_id"),
        explode(Text.wordShingles(col("text"), n)).as("__s"))
      .select(col("doc_id"), md5(col("__s")).as("__h")))
    val uniq = sh.groupBy("__h")
      .agg(count(lit(1)).as("__df"), min(col("doc_id")).as("__owner"))
      .filter(col("__df") === 1)
      .groupBy(col("__owner").as("doc_id")).agg(count(lit(1)).as("n_unique"))
    sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(uniq, Seq("doc_id"), "left")
      .withColumn("n_unique", coalesce(col("n_unique"), lit(0L)))
      .withColumn("novelty_micros", expr("n_unique * 1000000 div n_shingles"))
      .select("doc_id", "n_shingles", "n_unique", "novelty_micros")
      .orderBy("doc_id")
  }

  /** L65: paragraph-level NEAR-dup pairs — [[paragraphDedup]]'s exact
    * match extended to the fuzzy case: n-gram Jaccard over PARAGRAPHS
    * (non-overlapping `para`-token windows), via the same
    * blocked/df-cut/verified [[ngramJaccardPairs]] machinery the
    * document level uses — paragraphs become synthetic documents
    * (pid = doc_id·idxCap + para_idx) and every scale property
    * (bounded blocks, df cut, single pair exchange) carries over.
    * Blocking is LENGTH-BAND ONLY: a paragraph is a sub-document unit,
    * and the corpus's known near-dup trait (identical text under
    * different language labels) means a lang block would hide exactly
    * the reuse this operator exists to find. Intra-document pairs are
    * legitimate output (a doc repeating its own near-boilerplate).
    * `idxCap` bounds para_idx in-plan (assert_true — the maxGroupRows
    * named-failure discipline); doc_id must fit Long.Max/idxCap
    * (~8.8e12 at the default — beyond any real corpus id space). */
  def paragraphNearDupPairs(
      docs: DataFrame,
      para: Int = 20,
      n: Int = 3,
      tau: Double = 0.3,
      bandWidth: Int = 50,
      maxDf: Int = 128,
      idxCap: Int = 1 << 20): DataFrame = {
    val toks = split(col("text"), " ")
    val nP = when(size(toks) <= para, lit(1))
      .otherwise(ceil(size(toks).cast("double") / para).cast("int"))
    // the pid depends on the guard so the assertion cannot be pruned
    val guard = coalesce(
      assert_true(col("pos") < idxCap,
        concat(lit(s"para_idx >= idxCap $idxCap for doc "), col("doc_id")))
        .cast("long"), lit(0L))
    val paras = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), toks.as("__toks"), nP.as("__np"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("__np") - 1),
          i => array_join(slice(col("__toks"), i * para + 1, lit(para)), " "))))
      .select((col("doc_id") * idxCap + col("pos") + guard).as("doc_id"),
        lit("").as("lang"),
        length(col("col")).cast("long").as("n_chars"), col("col").as("text"))
    ngramJaccardPairs(paras, n, tau, bandWidth, maxDf)
      .select(expr(s"a_id div $idxCap").as("a_doc"),
        expr(s"a_id % $idxCap").cast("int").as("a_idx"),
        expr(s"b_id div $idxCap").as("b_doc"),
        expr(s"b_id % $idxCap").cast("int").as("b_idx"),
        col("jaccard"))
      .orderBy("a_doc", "a_idx", "b_doc", "b_idx")
  }

  /** L60: PARAGRAPH-level exact dedup + document reassembly — the
    * sub-document dedup granularity production pipelines run between
    * whole-document dedup (L1) and span cutting (L47): a paragraph
    * duplicated anywhere in the corpus survives only at its first
    * occurrence (min (doc_id, para_idx)), and every document is
    * re-emitted with its surviving paragraphs rejoined in order
    * (cf. RefinedWeb/Dolma paragraph dedup; mssql_dataframe has no
    * sub-row analogue — this is engine-added surface).
    *
    * The synthetic corpus has no newline delimiters, so a "paragraph"
    * is a non-overlapping `para`-token window ([[graft.operators
    * .Curation.chunkDocuments]]'s segmentation at stride = window); on
    * real corpora pass a delimiter-split upstream and `para` large.
    *
    * Scale: three exchanges, all map-side combinable — (1) winner
    * aggregate keyed by the paragraph content HASH (partial min per mapper, so
    * a boilerplate paragraph duplicated a billion times reduces to one
    * row per mapper BEFORE the shuffle — no hot-key task, the reason
    * this is an aggregate and not a PARTITION BY window); (2) regroup
    * of the winner rows (≤ one per distinct paragraph) by keeper doc;
    * (3) a doc-keyed count join. Shuffle volume is O(distinct
    * paragraphs), never O(corpus paragraphs). */
  /** Non-overlapping `para`-token windows of every non-null-text doc:
    * (doc_id, para_idx, para_text) — the shared segmentation under
    * L60/L74 (and the synthetic-doc form L65 builds inline). */
  private def segmentParagraphs(docs: DataFrame, para: Int): DataFrame = {
    require(para > 0, "need para > 0")
    val toks = split(col("text"), " ")
    val nP = when(size(toks) <= para, lit(1))
      .otherwise(ceil(size(toks).cast("double") / para).cast("int"))
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), toks.as("__toks"), nP.as("__np"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("__np") - 1),
          i => array_join(slice(col("__toks"), i * para + 1, lit(para)), " "))))
      .select(col("doc_id"), col("pos").cast("int").as("para_idx"),
        col("col").as("para_text"))
  }

  /** Reassemble per-doc surviving paragraphs against the full per-doc
    * totals — L60/L74's shared output shape: (doc_id, n_paras, n_kept,
    * clean_text), emptied docs kept with n_kept = 0. */
  private def reassemble(all: DataFrame, kept: DataFrame): DataFrame = {
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("para_idx"), col("para_text")))),
          s => s.getField("para_text")), " ").as("clean_text"))
    all.groupBy("doc_id").agg(count(lit(1)).as("n_paras"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** L74: paragraph-level DECONTAMINATION — cut from every training
    * document the paragraphs that appear ANYWHERE in the eval corpus,
    * and reassemble the survivors in order. The span-granular sibling
    * of the L15 doc-level contamination gate: a mostly-clean document
    * keeps its clean paragraphs instead of being dropped whole (or
    * worse, kept whole because its CONTAMINATION ratio sat under the
    * doc-level tau while its eval paragraphs leaked verbatim).
    *
    * Scale: the eval side reduces to a DISTINCT 16-byte-hash relation
    * (eval corpora are benchmark-sized — the anti-join's broadcast
    * side at any corpus scale, and AQE makes that call); the train
    * side is one segmentation scan, the hash anti-join, and L60's two
    * map-side-combinable reassembly rollups. Shuffle volume is
    * O(train paragraphs), nothing quadratic. */
  def decontaminateParagraphs(train: DataFrame, evalSet: DataFrame,
      para: Int = 20): DataFrame = {
    val evalH = segmentParagraphs(evalSet, para)
      .select(unhex(md5(col("para_text"))).as("__h")).distinct()
    val tp = segmentParagraphs(train, para)
    val kept = tp.join(evalH, unhex(md5(tp("para_text"))) === evalH("__h"), "left_anti")
    reassemble(tp, kept)
  }

  def paragraphDedup(docs: DataFrame, para: Int = 20): DataFrame = {
    // ONE segmentation pass feeds the winner aggregate and the
    // reassembly join (uncached, the tokenize+explode pipeline runs
    // twice)
    val paras = cached(segmentParagraphs(docs, para))
    // winner aggregate keyed on the 16-byte content hash, text carried
    // once in the min-struct payload: fixed-width group keys make the
    // combiner's hash table and the exchange's key compares cheap at
    // 100 TB (variable-length multi-hundred-byte text keys were the r9
    // shape); (doc_id, para_idx) leads the struct, so the winner never
    // tie-breaks into the text. 128-bit md5 collisions are below any
    // corpus's error floor (the L3/L4 sketch convention).
    val winners = paras
      .groupBy(unhex(md5(col("para_text"))).as("__h"))
      .agg(min(struct(col("doc_id"), col("para_idx"), col("para_text"))).as("__w"))
      .select(col("__w.doc_id").as("doc_id"),
        col("__w.para_idx").as("para_idx"), col("__w.para_text").as("para_text"))
    reassemble(paras, winners)
  }
}
