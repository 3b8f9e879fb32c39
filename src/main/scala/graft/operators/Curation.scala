package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Training-mix curation operators (SURVEY §2 L17/L18): deterministic
  * per-group quota sampling and corpus-statistics term weighting.
  */
object Curation {

  /** Portable deterministic order key: md5 of the rendered id. The same
    * expression exists verbatim in DuckDB (md5 == Spark md5 on strings),
    * so quota membership is reproducible across engines — a curation
    * decision audit can re-derive exactly which rows were kept. */
  private def hashKey(id: Column): Column = md5(id.cast("string"))

  /** Keep at most `cap` rows per group, chosen by deterministic hash
    * order (L17). Two-phase exact top-k: phase 1 ranks within
    * (group, salt) partitions and keeps `cap` per salt — bounding any
    * one window partition regardless of group size — phase 2 ranks the
    * ≤ salts×cap survivors per group. A 100 TB group never funnels
    * through a single window task; the global pass handles at most
    * salts×cap rows per group. */
  def stratifiedCap(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      cap: Int,
      salts: Int = 32): DataFrame = {
    val key = hashKey(col(idCol))
    val local = Window.partitionBy(col(groupCol), pmod(xxhash64(col(idCol)), lit(salts)))
      .orderBy(key, col(idCol))
    val survivors = df
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= cap).drop("__lr")
    val global = Window.partitionBy(col(groupCol)).orderBy(key, col(idCol))
    survivors
      .withColumn("sample_rank", row_number().over(global))
      .filter(col("sample_rank") <= cap)
  }

  /** Cluster-balanced ("diverse") sampling over an embedding column
    * (L31) — the SemDeDup-style subset-selection step: partition the
    * embedding space with the portable hash-sampled quantizer (L7d)
    * and take a per-cluster quota, so the sample covers the space
    * instead of oversampling its densest mode (what a uniform hash
    * sample does on skewed corpora). Both stages are scale-correct AND
    * ANSI-mirrorable: assignment is exact integer arithmetic
    * ([[graft.similarity.Ann.portableAssignments]]), the quota is the
    * salted two-phase md5-ordered cap ([[stratifiedCap]]) — no cluster
    * funnels through one window task. Output: (vec_id, cl, sample_rank). */
  def diverseSample(embeddings: DataFrame, nClusters: Int = 8, cap: Int = 10): DataFrame =
    stratifiedCap(
      graft.similarity.Ann.portableAssignments(embeddings, nClusters),
      "cl", "vec_id", cap)

  /** Weighted sampling WITHOUT replacement per group (L23) — the
    * Efraimidis–Spirakis A-ES scheme, the training-mix primitive for
    * "sample by quality score": each row draws a deterministic
    * hash-uniform u ∈ (0,1) and the k largest u^(1/w) per group form
    * the sample, giving inclusion odds proportional to weight with no
    * reservoir and no driver state — it distributes as the same salted
    * two-phase top-k as [[stratifiedCap]], so no group ever funnels
    * through one window task.
    *
    * Reproducible across engines: u comes from the first 8 hex digits
    * of md5(id) ((v + 0.5)/2^32 — the +0.5 keeps u > 0), arithmetic
    * that exists verbatim in ANSI SQL; the selection key ln(u)/w
    * (order-equivalent to u^(1/w)) is rounded to 9 dp with an id
    * tie-break, absorbing last-ulp libm differences between engines.
    * Weights must be > 0 (callers clamp). */
  def weightedSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weight: Column,
      k: Int,
      salts: Int = 32): DataFrame = {
    val v = conv(substring(hashKey(col(idCol)), 1, 8), 16, 10).cast("double")
    val key = round(log((v + 0.5) / 4294967296.0) / weight.cast("double"), 9)
    val local = Window.partitionBy(col(groupCol), pmod(xxhash64(col(idCol)), lit(salts)))
      .orderBy(col("__k").desc, col(idCol))
    val survivors = df.withColumn("__k", key)
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= k).drop("__lr")
    val global = Window.partitionBy(col(groupCol)).orderBy(col("__k").desc, col(idCol))
    survivors.withColumn("sample_rank", row_number().over(global))
      .filter(col("sample_rank") <= k)
      .drop("__k")
  }

  /** Greedy sequence packing (L28) — the "concatenate then split at
    * seqLen boundaries" step that turns a curated corpus into
    * fixed-length training sequences: documents are laid out in a
    * deterministic hash order and each learns which sequence its first
    * token lands in (`seq_id`) and at what offset (`start_off`).
    *
    * Packing is SHARD-LOCAL: documents first hash into
    * (group, shard) cells and the running-token layout is computed per
    * cell — exactly how production packers parallelize, and what keeps
    * the window partitioned (a single global layout would funnel 100 TB
    * through one task; PlanAuditSpec-class concern). The order key and
    * the shard both derive from md5(doc_id) with arithmetic that exists
    * verbatim in ANSI SQL, so the layout is reproducible across
    * engines. */
  def packSequences(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      tokens: Column,
      seqLen: Int,
      shards: Int = 64): DataFrame = {
    val ord = hashKey(col(idCol))
    val shard = pmod(conv(substring(ord, 1, 8), 16, 10).cast("long"), lit(shards))
    val w = Window.partitionBy(col(groupCol), col("pack_shard"))
      .orderBy(col("__ord"), col(idCol))
    docs
      .select(col(groupCol), col(idCol), tokens.cast("long").as("n_tokens"),
        ord.as("__ord"), shard.as("pack_shard"))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", floor(col("__start") / seqLen))
      .withColumn("start_off", pmod(col("__start"), lit(seqLen.toLong)))
      .drop("__start")
  }

  /** L69: NO-SPLIT greedy packing — the document-boundary-preserving
    * twin of [[packSequences]] (L28): L28 concatenates then splits, so
    * a document can straddle two training sequences; this packer keeps
    * every document whole — a new sequence opens when the next document
    * does not fit — the layout EOS-separated training and most
    * fine-tuning recipes require. A document longer than `seqLen` gets
    * a bin of its own (`overflow` = true: the trainer's truncation
    * decision, not silently dropped).
    *
    * Greedy fill is a sequential recurrence (the bin break depends on
    * the running remainder — not associative, no window/prefix-sum
    * escape), so it folds PER CELL (group × md5-shard): the cell's
    * sorted doc list is collected into one row (bounded by
    * `maxCellRows` with an in-plan assert_true — the maxGroupRows
    * discipline) and folded by one `aggregate` expression. Cells are
    * the packing contract's parallel unit (exactly L28/L42's: `shards`
    * scales with the corpus so a cell stays thousands of docs), and
    * the fold is one pass over each cell's array. Determinism: the
    * (md5, id) order and shard arithmetic are L28's, verbatim-ANSI. */
  def packNoSplit(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      tokens: Column,
      seqLen: Int,
      shards: Int = 64,
      maxCellRows: Int = 8192): DataFrame = {
    require(seqLen > 0, "need seqLen > 0")
    val ord = hashKey(col(idCol))
    val shard = pmod(conv(substring(ord, 1, 8), 16, 10).cast("long"), lit(shards))
    val rows = docs.select(col(groupCol), col(idCol).as("__id"),
      tokens.cast("long").as("n_tokens"), ord.as("__ord"), shard.as("pack_shard"))
    val cells = rows.groupBy(col(groupCol), col("pack_shard"))
      .agg(count(lit(1)).as("__cnt"),
        array_sort(collect_list(struct(col("__ord"), col("__id"), col("n_tokens"))))
          .as("__ds"))
      // the guard rides the shard column so it cannot be pruned
      .withColumn("__g", coalesce(
        assert_true(col("__cnt") <= maxCellRows,
          concat(lit(s"pack cell exceeds maxCellRows $maxCellRows: "), col("__cnt")))
          .cast("long"), lit(0L)))
      .withColumn("pack_shard", col("pack_shard") + col("__g"))
    val init = struct(
      expr("cast(array() as array<struct<id:bigint,n:bigint,bin:bigint,off:bigint>>)")
        .as("a"),
      lit(0L).as("bin"), lit(0L).as("end"))
    val folded = aggregate(col("__ds"), init,
      (acc, d) => {
        val n = d.getField("n_tokens")
        val end = acc.getField("end")
        val fits = end === 0L || end + n <= seqLen
        val bin = when(fits, acc.getField("bin")).otherwise(acc.getField("bin") + 1)
        val off = when(fits, end).otherwise(lit(0L))
        struct(
          concat(acc.getField("a"), array(struct(
            d.getField("__id").as("id"), n.as("n"), bin.as("bin"), off.as("off"))))
            .as("a"),
          bin.as("bin"), (off + n).as("end"))
      },
      acc => acc.getField("a"))
    cells.select(col(groupCol), col("pack_shard"), explode(folded).as("__p"))
      .select(col(groupCol), col("pack_shard"),
        col("__p.id").as("doc_id"), col("__p.n").as("n_tokens"),
        col("__p.bin").as("bin_seq"), col("__p.off").as("start_off"),
        (col("__p.n") > seqLen).as("overflow"))
      .orderBy(groupCol, "pack_shard", "bin_seq", "start_off", "doc_id")
  }

  /** Deterministic shard export (L42) — the last step of a training-data
    * pipeline: the curated corpus lands in `nShards` output shards with
    * a stable, engine-reproducible assignment (shard = first-8-hex of
    * md5(doc_id) mod nShards — A14b's portable arithmetic) and a
    * deterministic within-shard order (`pos`, ranked by the full md5
    * then id). Properties a trainer needs and a random split lacks:
    *  - RE-RUN STABLE: the same corpus always produces the same shards,
    *    so a resumed/re-executed export job is idempotent.
    *  - ADDITIVE: a document's shard depends only on its own id — new
    *    batches never reshuffle previously exported docs.
    *  - EVEN: md5 uniformity keeps shard sizes within sampling noise of
    *    corpus/nShards; nShards is chosen for target file size, so no
    *    shard outgrows a task.
    * The `pos` ranking is one window per shard — each shard sorts its
    * own rows, which is exactly the write-side sort [[writeShards]]
    * needs anyway; nothing global, nothing collected. */
  def shardAssignments(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    val h = hashKey(col(idCol))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    docs
      .withColumn("__h", h)
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w) - 1)
      .drop("__h")
  }

  /** Materialize [[shardAssignments]] as one parquet dir per shard
    * (`shard=K/`): one hash-partition shuffle, each task writing its
    * shard sorted in the deterministic order — byte-stable output for a
    * byte-stable input. */
  def writeShards(docs: DataFrame, path: String, nShards: Int,
      idCol: String = "doc_id"): Unit =
    shardAssignments(docs, nShards, idCol)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Count-min sketch over corpus tokens (L44) — the bounded-memory
    * point-frequency summary next to L25's SpaceSaving top-k: d hash
    * rows × w buckets answer "how often does ANY term occur" with a
    * one-sided error (estimate ≥ truth, overshoot ≤ εN with d·w memory
    * independent of vocabulary size). Properties that matter at 100 TB:
    *  - ONE linear pass with map-side combine; the d-way row fan-out
    *    collapses to ≤ d·w rows per task before the only shuffle;
    *  - MERGEABLE: sketches are counters, so shard sketches sum into
    *    the corpus sketch (spec-pinned) — build per ingest batch, add;
    *  - PORTABLE: bucket = first-8-hex(md5("r|term")) mod w (the A14b
    *    idiom), so an ANSI engine rebuilds the sketch bit-for-bit.
    * Returns (r, b, n) — d·w rows at most. */
  def countMinSketch(docs: DataFrame, d: Int = 4, w: Int = 1024,
      textCol: String = "text"): DataFrame =
    docs
      .select(explode(Text.tokens(col(textCol))).as("t"))
      .select(explode(sequence(lit(0), lit(d - 1))).as("r"), col("t"))
      .select(col("r"), pmod(conv(substring(
        md5(concat(col("r").cast("string"), lit("|"), col("t"))), 1, 8), 16, 10)
        .cast("long"), lit(w.toLong)).as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("n"))

  /** Point estimates from a [[countMinSketch]]: each probe term reads
    * its d buckets and takes the min. `terms` is a small relation
    * (probe list) — the join against the ≤ d·w sketch is trivially
    * broadcast by AQE; nothing corpus-scale moves. */
  def cmsEstimate(sketch: DataFrame, terms: DataFrame, d: Int = 4, w: Int = 1024,
      termCol: String = "term"): DataFrame =
    terms
      .select(col(termCol).as("term"))
      .select(col("term"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("b", pmod(conv(substring(
        md5(concat(col("r").cast("string"), lit("|"), col("term"))), 1, 8), 16, 10)
        .cast("long"), lit(w.toLong)))
      .join(sketch, Seq("r", "b"), "left")
      .groupBy("term")
      // a term whose bucket row is absent was never counted → estimate 0
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))

  /** Domain-level curation rollup (L48) — the per-SOURCE verdict table
    * a blocklist pipeline builds (the C4/RefinedWeb "bad domains" step):
    * each source's mean stopword ratio (natural-language-ness) and mean
    * duplicated-token fraction (L32's span stats), with a block flag
    * when the source reads like boilerplate (low stopword mass) or
    * like a mirror (high duplication). Engine-exact throughout: both
    * per-doc ratios are 6-dp integer micros computed by half-up
    * integer division from exact counts (never a rounded double), the
    * per-source means divide exact micro sums the same way, and the
    * flag compares integer micros against integer thresholds.
    * Cost = L32's span pass + one tokens scan + a source-keyed rollup
    * (sources ≪ docs — the aggregate collapses map-side). */
  def sourceQuality(docs: DataFrame,
      minStopMicros: Long = 55000, maxDupMicros: Long = 50000): DataFrame = {
    val toks = Text.tokens(col("text"))
    val en = typedLit(Text.Stopwords.toMap.apply("en"))
    val perDoc = docs.select(col("doc_id"), col("source"),
        size(toks).cast("long").as("__n"),
        size(filter(toks, t => array_contains(en, t))).cast("long").as("__stop"))
      .withColumn("__stopm", expr("(2 * 1000000 * __stop + __n) div (2 * __n)"))
    val dup = graft.dedup.Dedup.substringDupStats(docs)
      .withColumn("__dupm", expr("(2 * 1000000 * dup_tokens + n_tokens) div (2 * n_tokens)"))
      .select(col("doc_id"), col("__dupm"))
    perDoc.join(dup, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("__stopm").as("__ss"), sum("__dupm").as("__sd"))
      .withColumn("__ms", expr("(2 * __ss + n_docs) div (2 * n_docs)"))
      .withColumn("__md", expr("(2 * __sd + n_docs) div (2 * n_docs)"))
      .select(col("source"), col("n_docs"),
        (col("__ms").cast("double") / 1000000.0).as("mean_stopword_ratio"),
        (col("__md").cast("double") / 1000000.0).as("mean_dup_frac"),
        (col("__ms") < minStopMicros || col("__md") > maxDupMicros).as("blocked"))
  }

  /** L73: source-mix sampling plan — the rebalancing arithmetic every
    * multi-source pretraining run does before it touches a row: given
    * the per-source token inventory, compute the UNIFORM per-source
    * target (total div sources), the keep-rate that downsamples each
    * over-represented source toward it (capped at 1e6 micros — an
    * under-represented source keeps everything; upsampling/repetition
    * is a different operator, L29's temperature family), and the
    * expected post-sampling tokens. Exact integer micros throughout
    * (floor semantics), so the plan is engine-portable and the rates
    * feed [[weightedSample]]'s hash gate directly. Scale: one
    * map-side-combined rollup to G rows; the totals broadcast back. */
  def mixPlan(docs: DataFrame, groupCol: String = "source"): DataFrame = {
    // ONE corpus scan: the G-sized rollup feeds both the totals and
    // the final projection (uncached, the corpus is scanned twice)
    val g = graft.OperatorCache.cached(
      docs.filter(col("text").isNotNull)
        .groupBy(col(groupCol).as("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens")))
    val tot = g.agg(count(lit(1)).as("__g"), sum(col("n_tokens")).as("__t"))
    g.crossJoin(broadcast(tot))
      .withColumn("target_tokens", expr("__t div __g"))
      .withColumn("rate_micros",
        least(lit(1000000L), expr("(__t div __g) * 1000000 div n_tokens")))
      .withColumn("expected_tokens", expr("n_tokens * rate_micros div 1000000"))
      .select("source", "n_docs", "n_tokens", "target_tokens",
        "rate_micros", "expected_tokens")
      .orderBy("source")
  }

  /** L58: token-budget corpus selection — the "fill the training
    * budget with the best data" cut every pretraining run makes:
    * documents rank by (quality desc, doc_id) and the kept set is the
    * greedy PREFIX — every document whose cumulative token count
    * (itself included) fits `budgetTokens`. Quality is the en-stopword
    * ratio in exact integer micros (the sourceQuality idiom), so the
    * total order is engine-portable and the whole selection has an
    * ANSI oracle.
    *
    * Scale: a global cumulative sum WITHOUT a global window — a bare
    * `Window.orderBy` would funnel 100 TB through ONE partition.
    * Instead: scores quantize into ≤ 1001 bands (micros div 1000); one
    * map-side-combined band rollup (bounded, model-sized) gives each
    * band's token total; the driver folds the 1001-row cumulative (the
    * scalar-collect class) into per-band offsets; fully-fitting bands
    * pass straight through, and ONLY the single crossing band pays a
    * window — partitioned BY BAND. In-band order (score desc, doc_id)
    * agrees with the global order because bands are score-disjoint, so
    * the result is exactly the naive global prefix (the oracle computes
    * that naive form). */
  def budgetSelect(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val en = typedLit(Text.Stopwords.toMap.apply("en"))
    val toks = Text.tokens(col("text"))
    // a NULL text has no tokens and can never be selected — filtered
    // explicitly (its null score would otherwise flow into the band
    // arithmetic as a silent null row). ONE scoring scan feeds the
    // band rollup AND the pass-through/crossing branches (three
    // consumers — uncached, the tokenize+score pipeline runs thrice)
    val scored = graft.OperatorCache.cached(
      docs.filter(col("text").isNotNull).select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(filter(toks, t => array_contains(en, t))).cast("long").as("__stop"))
        .withColumn("score_micros",
          expr("(2 * 1000000 * __stop + n_tokens) div (2 * n_tokens)"))
        .withColumn("__band", expr("score_micros div 1000"))
        .drop("__stop"))
    val bandTotals = scored.groupBy("__band").agg(sum(col("n_tokens")).as("__t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    var acc = 0L
    val offsets = bandTotals.map { case (b, t) => val s = acc; acc += t; (b, s, s + t) }
    val fullBands = offsets.filter(_._3 <= budgetTokens).map(_._1).toSeq
    val crossing = offsets.find(_._3 > budgetTokens)
    val kept = scored.filter(col("__band").isInCollection(fullBands))
    val partial = crossing match {
      case Some((b, start, _)) if start < budgetTokens =>
        val w = Window.partitionBy("__band")
          .orderBy(col("score_micros").desc, col("doc_id"))
        scored.filter(col("__band") === b)
          .withColumn("__cum", sum(col("n_tokens")).over(w) + lit(start))
          .filter(col("__cum") <= budgetTokens).drop("__cum")
      case _ => scored.limit(0)
    }
    kept.unionByName(partial)
      .select("doc_id", "n_tokens", "score_micros").orderBy("doc_id")
  }

  /** L59: PER-GROUP token-budget selection — [[budgetSelect]]'s
    * data-mixing form: each group (source/domain/language) fills its
    * OWN token budget with its best documents, the way a mixture spec
    * ("x tokens of web, y of code") is actually materialized. Same
    * greedy-prefix contract per group, same exact-integer score, same
    * banded plan — the band rollup and the driver fold go per
    * (group, band) (bounded: groups × ≤1001 rows, capped by
    * `maxGroups` under the maxGroupRows discipline), fully-fitting
    * bands pass through, and the per-group crossing bands pay ONE
    * window partitioned by (group, band). Groups proceed fully in
    * parallel; no stage depends on corpus-global order.
    *
    * Groups render as STRINGS in the output, and a NULL group value is
    * its own budget line under the reserved `__NULL_GROUP__` key
    * (spec-pinned) — silently dropping null-group documents would be
    * the unguarded alternative. */
  def budgetSelectPerGroup(docs: DataFrame, groupCol: String,
      budgetPerGroup: Long, maxGroups: Int = 1000): DataFrame =
    budgetSelectGrouped(docs, groupCol, s"budgetSelectPerGroup($groupCol)",
      _ => budgetPerGroup, maxGroups)

  /** L59b: mixture-SPEC budget selection — the full materializer of a
    * data-mixture table ("800 tokens of src0, 400 of src5, none of the
    * rest"): per-group budgets come from the spec map, and a group
    * ABSENT from the spec has budget 0 — it contributes nothing, which
    * is exactly what a mixture spec means by omission. Same banded
    * plan as [[budgetSelectPerGroup]] (the uniform-budget special
    * case); the spec map is driver-side config, model-sized by
    * nature. */
  def budgetSelectMixture(docs: DataFrame, groupCol: String,
      budgets: Map[String, Long], maxGroups: Int = 1000): DataFrame =
    budgetSelectGrouped(docs, groupCol, s"budgetSelectMixture($groupCol)",
      g => budgets.getOrElse(g, 0L), maxGroups)

  /** Shared banded per-group greedy-prefix core (see the public
    * wrappers above for the contract and scale rationale). */
  private def budgetSelectGrouped(docs: DataFrame, groupCol: String,
      opName: String, budgetOf: String => Long, maxGroups: Int): DataFrame = {
    val en = typedLit(Text.Stopwords.toMap.apply("en"))
    val toks = Text.tokens(col("text"))
    // groups render to strings; a NULL group is its own budget line
    // under a reserved key (concat_ws SKIPS nulls — unguarded, null-
    // group documents would silently never be selected)
    val g = coalesce(col(groupCol).cast("string"), lit("__NULL_GROUP__"))
    // ONE scoring scan feeds the (group, band) rollup AND the
    // pass-through/crossing branches (the budgetSelect sharing
    // discipline)
    val scored = graft.OperatorCache.cached(docs
      .filter(col("text").isNotNull).select(g.as("__g"), col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => array_contains(en, t))).cast("long").as("__stop"))
      .withColumn("score_micros",
        expr("(2 * 1000000 * __stop + n_tokens) div (2 * n_tokens)"))
      .withColumn("__band", expr("score_micros div 1000"))
      .drop("__stop"))
    val SEP = '\u0001' // unambiguous (group, band) key separator
    val bandRows = scored.groupBy("__g", "__band").agg(sum(col("n_tokens")).as("__t"))
      .limit(maxGroups * 1001 + 1).collect()
    if (bandRows.iterator.map(_.getString(0)).toSet.size > maxGroups)
      throw graft.errors.TooManyPartitions(opName, maxGroups)
    // per-group cumulative over the ≤1001 bands (driver fold, model-sized)
    val perGroup = bandRows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val fullKeys = scala.collection.mutable.ArrayBuffer[String]()
    val crossings = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    perGroup.foreach { case (g, rows) =>
      val budget = budgetOf(g)
      var acc = 0L
      rows.sortBy(-_._2).foreach { case (_, band, t) =>
        if (acc + t <= budget) { fullKeys += s"$g$SEP$band"; acc += t }
        else if (acc < budget && crossings.forall(_._1 != g)) {
          crossings += ((g, band, acc)); acc += t
        } else acc += t
      }
    }
    val key = concat_ws(SEP.toString, col("__g"), col("__band"))
    val kept = scored.filter(key.isInCollection(fullKeys.toSeq))
    val crossKeys = crossings.map { case (g, b, _) => s"$g$SEP$b" }.toSeq
    val offsetOf = typedLit(crossings.map { case (g, b, s) => (s"$g$SEP$b", s) }.toMap)
    // budgets of the groups PRESENT (driver-derived, model-sized): the
    // crossing-band filter compares each group's own budget
    val budgetLit = typedLit(perGroup.keysIterator.map(g => g -> budgetOf(g)).toMap)
    val w = Window.partitionBy("__g", "__band")
      .orderBy(col("score_micros").desc, col("doc_id"))
    val partial = scored.filter(key.isInCollection(crossKeys))
      .withColumn("__cum", sum(col("n_tokens")).over(w) + element_at(offsetOf, key))
      .filter(col("__cum") <= element_at(budgetLit, col("__g"))).drop("__cum")
    kept.unionByName(partial)
      .select(col("__g").as(groupCol), col("doc_id"), col("n_tokens"), col("score_micros"))
      .orderBy(groupCol, "doc_id")
  }

  /** L72: curriculum phase assignment — the ordering step of
    * quality-curriculum training ("start on the cleanest data, finish
    * on the rest"): every document gets a phase 0..nPhases−1 by its
    * position in the corpus-wide quality order (score desc, doc_id),
    * phase = ⌊pos·nPhases/n⌋ — phase 0 is the best n/nPhases documents.
    *
    * A global rank without a global window (the L58 banded plan,
    * rank-flavored): per-band DOC COUNTS roll up (≤1001 rows — scores
    * are micros, bands are score div 1000), the driver folds cumulative
    * offsets, bands lying entirely inside one phase take it as a
    * constant via a literal map, and ONLY the ≤ nPhases−1
    * phase-crossing bands pay a window — partitioned BY BAND, never
    * single-partition. Ties cannot straddle bands (equal scores share a
    * band), so the banded order equals the global order exactly. */
  def curriculumPhases(docs: DataFrame, nPhases: Int = 3): DataFrame = {
    require(nPhases > 0, "need nPhases > 0")
    val en = typedLit(Text.Stopwords.toMap.apply("en"))
    val toks = Text.tokens(col("text"))
    // ONE scoring scan feeds the band rollup AND the uniform/crossing
    // branches (three consumers — uncached, the tokenize+score pipeline
    // would run three times; the budgetSelect sharing discipline)
    val scored = graft.OperatorCache.cached(
      docs.filter(col("text").isNotNull).select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(filter(toks, t => array_contains(en, t))).cast("long").as("__stop"))
        .withColumn("score_micros",
          expr("(2 * 1000000 * __stop + n_tokens) div (2 * n_tokens)"))
        .withColumn("__band", expr("score_micros div 1000"))
        .drop("__stop"))
    val bandCounts = scored.groupBy("__band").agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val n = bandCounts.iterator.map(_._2).sum
    if (n == 0L)
      // same final projection as the populated path — an empty corpus
      // must not leak the internal __band column into the schema
      return scored.limit(0).withColumn("phase", lit(0))
        .select("doc_id", "n_tokens", "score_micros", "phase")
    var acc = 0L
    val offsets = bandCounts.map { case (b, c) => val s = acc; acc += c; (b, s, s + c) }
    def phaseAt(pos: Long): Int = (pos * nPhases / n).toInt
    val (uniform, crossing) = offsets.partition { case (_, s, e) =>
      phaseAt(s) == phaseAt(e - 1) }
    val uni =
      if (uniform.isEmpty) scored.limit(0).withColumn("phase", lit(0))
      else scored.filter(col("__band").isInCollection(uniform.map(_._1).toSeq))
        .withColumn("phase", element_at(
          typedLit(uniform.map { case (b, s, _) => (b, phaseAt(s)) }.toMap), col("__band")))
    val cr =
      if (crossing.isEmpty) scored.limit(0).withColumn("phase", lit(0))
      else {
        val w = Window.partitionBy("__band")
          .orderBy(col("score_micros").desc, col("doc_id"))
        scored.filter(col("__band").isInCollection(crossing.map(_._1).toSeq))
          .withColumn("__pos", row_number().over(w).cast("long") - 1 + element_at(
            typedLit(crossing.map { case (b, s, _) => (b, s) }.toMap), col("__band")))
          .withColumn("phase", expr(s"(__pos * $nPhases) div $n").cast("int"))
          .drop("__pos")
      }
    uni.unionByName(cr)
      .select("doc_id", "n_tokens", "score_micros", "phase").orderBy("doc_id")
  }

  /** Temperature-based mix resampling (L29) — flatten a skewed group
    * (language/domain) distribution toward shares ∝ n^alpha, the
    * multilingual-pretraining mixing step: group g keeps each row with
    * probability r_g = (n_min/n_g)^(1-alpha) (the smallest group keeps
    * everything; bigger groups downsample toward balance). The keep
    * decision u < r_g uses the same md5-hash uniform as
    * [[weightedSample]]; both sides are rounded to 6 dp so the
    * comparison is engine-portable. Group counts are one tiny aggregate
    * broadcast back — nothing quadratic, nothing collected. Fixed
    * alpha = 0.5 keeps the exponent a correctly-rounded sqrt (pow is
    * not bit-identical across libms; sqrt is). */
  def temperatureSample(
      df: DataFrame,
      groupCol: String,
      idCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__n_min"))
    val v = conv(substring(hashKey(col(idCol)), 1, 8), 16, 10).cast("double")
    val u = round((v + 0.5) / 4294967296.0, 6)
    df.join(broadcast(counts), groupCol)
      .crossJoin(broadcast(nMin))
      .withColumn("__r", round(sqrt(col("__n_min").cast("double") / col("__n")), 6))
      .filter(u < col("__r"))
      .drop("__n", "__n_min", "__r")
  }

  /** L51: tokenizer-vocabulary coverage audit — the "will my tokenizer
    * handle this corpus" check between vocabulary training (L46) and
    * encoding: given the deterministic top-V corpus vocabulary, the
    * out-of-vocabulary token share per language. High OOV in a language
    * says the vocabulary under-serves it (the multilingual-fairness
    * audit a tokenizer ships with). One token explode feeds BOTH the
    * vocabulary heap-top-V and the coverage join (cached); the rollup
    * output is language-sized. The share is half-up integer micros —
    * engine-exact. */
  /** Deterministic top-V vocabulary over a token relation: ties at the
    * cut break on the term (TakeOrderedAndProject — per-partition
    * heaps, no global sort). One column `w`. */
  private def vocabFromTokens(toks: DataFrame, vocabSize: Int): DataFrame =
    toks.groupBy("w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("w")).limit(vocabSize)
      .select(col("w"))

  /** The corpus's deterministic top-V vocabulary as a standalone
    * relation — the static model side of the streaming drift monitor
    * (S25) and the shareable artifact of the L51 audit. */
  def topVocabulary(docs: DataFrame, vocabSize: Int = 1000): DataFrame =
    vocabFromTokens(
      docs.select(explode(Text.tokens(col("text"))).as("w")), vocabSize)

  def vocabCoverage(docs: DataFrame, vocabSize: Int = 1000): DataFrame = {
    val toks = graft.OperatorCache.cached(
      docs.select(col("doc_id"), col("lang"),
        explode(Text.tokens(col("text"))).as("w")))
    val vocab = vocabFromTokens(toks, vocabSize).withColumn("__in", lit(1))
    // vocab joins back un-hinted (vocabulary-sized; AQE broadcasts)
    toks.join(vocab, Seq("w"), "left")
      .groupBy("lang")
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_share", expr(
        "cast((2 * 1000000 * oov_tokens + n_tokens) div (2 * n_tokens) as double)") / 1000000.0)
      .orderBy("lang")
  }

  /** Corpus-boilerplate stripping (L30) — the transform cousin of the
    * dedup df-cut: terms whose DOCUMENT frequency exceeds `maxDf` are
    * corpus furniture (headers, footers, injected templates) and are
    * removed from every document, preserving the original token order.
    * Linear shapes only: positional explode, one term-level aggregate
    * (vocabulary-sized, broadcastable), a semi-join-like filter, and an
    * order-restoring per-doc re-aggregation — nothing quadratic, no
    * driver state. Documents whose every token is boilerplate survive
    * with empty text (the caller's quality gate drops them). */
  def stripBoilerplate(docs: DataFrame, maxDf: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(Text.tokens(col("text"))).as(Seq("__pos", "__term")))
    val dfreq = toks.groupBy("__term")
      .agg(countDistinct(col("doc_id")).as("__df"))
    // NO broadcast hint: the df table is vocabulary-sized, and a
    // web-scale token vocabulary can exceed the broadcast ceiling — the
    // join must stay free to shuffle. AQE broadcasts it at runtime
    // whenever it actually is small (every local SF), so the hint only
    // ever removed the safe fallback. Same rule as unigramLogprob's
    // term join below.
    val kept = toks.join(dfreq, "__term").filter(col("__df") <= maxDf)
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("__pos"), col("__term")))),
        s => s.getField("__term"))).as("clean_text"))
    docs.select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Per-document unigram language-model score (L19): the corpus itself
    * is the model — token log-probabilities from corpus frequencies,
    * each document scored by its mean token log-prob (≈ negative
    * cross-entropy; higher = more typical of the corpus). The
    * model-based cousin of the heuristic quality gate: outlier docs
    * (wrong language, boilerplate, garbage) score low. Two linear
    * aggregations (corpus term counts, per-doc sums after a broadcast-
    * able term-frequency join) — the "train" side is a term-count table
    * that at 100 TB is still only vocabulary-sized. */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("__c"))
    val total = toks.agg(count(lit(1)).as("__t"))
    // per-term log-prob rounded to 6dp THEN summed as exact DECIMAL:
    // float summation is order-dependent (and ln can differ in the last
    // ulp across engines), so the aggregate would not be bit-stable
    // across partitionings or vs the oracle — decimal addition is
    val logp = counts.crossJoin(broadcast(total))
      .select(col("term"),
        round(log(col("__c").cast("double") / col("__t")), 6)
          .cast("decimal(18,6)").as("__lp"))
    // plain join by design (no broadcast hint): logp is vocabulary-sized
    // — unbounded at corpus scale — so AQE picks broadcast only when the
    // runtime size allows it
    toks.join(logp, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__lp")).as("__sum"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__sum").cast("double") / col("n_tokens"), 6).as("avg_logprob"))
  }

  /** Per-document BIGRAM language-model score (L45) — the CCNet-style
    * perplexity-filter shape next to L19's unigram: each document's
    * mean log P(w|v) under add-1-smoothed corpus bigram counts
    * (P(w|v) = (c(v,w)+1)/(c(v·)+V)). Sequence-aware where the unigram
    * is bag-of-words: shuffled or template-stitched text keeps its
    * unigram score but collapses here. Same exactness discipline as
    * L19: per-bigram log-probs rounded to 6 dp and cut to DECIMAL
    * before the weighted sum, so the aggregate is bit-stable under any
    * partitioning and in ANSI SQL.
    *
    * Scale: the bigram stream is ≈ token count; everything reduces
    * through (v, w, doc) partial counts — corpus bigram counts, context
    * totals (Σ_w c(v,w), derived FROM the bigram table, no second
    * corpus pass) and the per-doc score all ride linear partial-agg
    * shuffles; the model is bigram-vocabulary-sized and joins back
    * un-hinted (AQE). Self-scoring by construction (every doc bigram is
    * in the corpus); scoring a FOREIGN corpus would left-join with the
    * unseen-bigram floor log(1/(c(v·)+V)). */
  def bigramLogprob(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= 2)
    val perDoc = toks.select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("__toks")) - 2),
          i => struct(element_at(col("__toks"), i + 1).as("v"),
            element_at(col("__toks"), i + 2).as("w")))).as("g"))
      .select(col("doc_id"), col("g.v").as("v"), col("g.w").as("w"))
      .groupBy("v", "w", "doc_id").agg(count(lit(1)).as("__c"))
    val bi = perDoc.groupBy("v", "w").agg(sum("__c").as("__cvw"))
    val ctx = bi.groupBy("v").agg(sum("__cvw").as("__cv"))
    val vocab = docs.select(explode(Text.tokens(col("text"))).as("t"))
      .agg(count_distinct(col("t")).as("__V"))
    val lp = bi.join(ctx, "v").crossJoin(broadcast(vocab))
      .select(col("v"), col("w"),
        round(log((col("__cvw") + 1).cast("double") / (col("__cv") + col("__V"))), 6)
          .cast("decimal(18,6)").as("__lp"))
    perDoc.join(lp, Seq("v", "w"))
      .groupBy("doc_id")
      .agg(sum(col("__c")).as("n_bigrams"),
        sum(col("__c").cast("decimal(12,0)") * col("__lp")).as("__sum"))
      // 6-dp mean via EXACT integer micros (the labelCentroids idiom):
      // engines' double round() disagrees on near-tie quotients — one
      // sf0.1 row landed on exactly such a boundary — while integer
      // half-away-from-zero division is bit-identical everywhere
      .withColumn("__s", (col("__sum").cast("decimal(18,6)") * 1000000).cast("long"))
      .select(col("doc_id"), col("n_bigrams"),
        ((signum(col("__s")).cast("long") *
          expr("(2 * abs(__s) + n_bigrams) div (2 * n_bigrams)")).cast("double")
          / 1000000.0).as("avg_logprob"))
  }

  /** One left-to-right non-overlapping BPE merge pass over a symbol
    * array: adjacent (a, b) becomes the concatenated symbol, scanning
    * once without re-examining a freshly merged token ("aaaa" under
    * (a,a) → [aa, aa], not [aaa, a]) — the classic merge semantics.
    * CaseWhen branches evaluate lazily, so the last-element probe never
    * runs on an empty accumulator (ANSI element_at would throw). */
  private def bpeMergeStep(symbols: Column, a: String, b: String): Column =
    aggregate(symbols, typedLit(Seq.empty[String]),
      (acc, s) => when(size(acc) === 0, concat(acc, array(s)))
        .when(element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Distributed BPE merge training (L46) — the tokenizer-training step
    * of an LLM data pipeline, at the scale trick every production BPE
    * trainer uses: train on the WORD VOCABULARY (word → corpus count),
    * not the corpus. One fact-scale shuffle builds the weighted vocab;
    * each of the k merge rounds is then a pair-count aggregate + an
    * argmax + a scan-side array rewrite over the VOCABULARY-sized
    * relation — corpus size never re-enters. Deterministic end to end:
    * exact integer pair counts, argmax ties break (count desc, a, b),
    * and the only driver traffic is one 1-row argmax per round (the
    * scalar-collect class the no-collect rule allows). Per-round
    * lineage is eagerly truncated (k nested HOF rewrites would
    * otherwise stack in one plan). Returns (merge_rank, left, right,
    * pair_count) — the ordered merge table a tokenizer ships. */
  def trainBpeMerges(docs: DataFrame, k: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs.select(explode(Text.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var exhausted = false
    for (r <- 1 to k if !exhausted) {
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, n))
        val next = vocab.select(bpeMergeStep(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint(true)
        vocab.unpersist()
        vocab = next
      }
    }
    vocab.unpersist()
    merges.toSeq.toDF("merge_rank", "left", "right", "pair_count")
  }

  /** Apply an ordered merge table to a corpus (the tokenizer-apply
    * step): every word re-derives its BPE segmentation by replaying the
    * merges in rank order — k chained scan-side rewrites, no shuffle
    * but the output sort. Returns per-doc whitespace and BPE token
    * counts (the compression a trained tokenizer achieves). */
  def applyBpe(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    // counts ride the native one-pass encoder (ids are irrelevant to a
    // count, so the vocabulary is empty): total segments = the id-array
    // size, words = the token-array size — ZERO shuffles where the
    // composed form exploded words and regrouped them per doc.
    // null-text docs are dropped — the same row set as the composed
    // witness, whose explode skips null token arrays (ADVICE r8)
    docs.filter(col("text").isNotNull).select(col("doc_id"),
      size(Text.tokens(col("text"))).cast("long").as("ws_tokens"),
      size(graft.plans.GraftFunctions.bpeEncode(col("text"), merges, Nil))
        .cast("long").as("bpe_tokens"))

  /** The composed explode→segment→regroup form, kept as the native
    * path's equivalence witness (CurationSpec). */
  private[graft] def applyBpeComposed(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val segmented = merges.foldLeft(split(col("w"), ""): Column) {
      case (c, (a, b)) => bpeMergeStep(c, a, b)
    }
    docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
      .select(col("doc_id"), size(segmented).cast("long").as("__n"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ws_tokens"), sum(col("__n")).as("bpe_tokens"))
  }

  /** The shipped tokenizer's vocabulary for a trained merge table
    * (L53): the corpus's distinct base characters (sorted) followed by
    * the merge products in rank order, ids 0..V−1 — the deterministic
    * id assignment an encoder and a decoder both re-derive. Bounded:
    * |alphabet| + |merges| rows. */
  def bpeVocabulary(docs: DataFrame, merges: Seq[(String, String)]): Seq[String] = {
    val chars = docs
      .select(explode(split(concat_ws("", Text.tokens(col("text"))), "")).as("c"))
      .filter(col("c") =!= "").distinct()
      .orderBy("c").collect().map(_.getString(0)).toIndexedSeq
    chars ++ merges.map { case (a, b) => a + b }
  }

  /** BPE ENCODING to token ids (L53) — the step [[applyBpe]]'s counts
    * summarize: every document's actual id sequence under a trained
    * tokenizer (merge table + [[bpeVocabulary]] ids). ZERO shuffles and
    * zero explodes: the whole encode — word split, per-word merge
    * replay (the same single-pass [[bpeMergeStep]] semantics the
    * trainer used), symbol→id lookup — is nested higher-order array
    * algebra riding the scan, embarrassingly parallel at any scale.
    * Symbols outside the vocabulary (characters unseen at train time)
    * encode as −1 (UNK). Returns (doc_id, input_ids, n_tokens). */
  def encodeBpe(docs: DataFrame, merges: Seq[(String, String)],
      vocab: Seq[String]): DataFrame =
    docs.select(col("doc_id"),
        graft.plans.GraftFunctions.bpeEncode(col("text"), merges, vocab).as("input_ids"))
      .withColumn("n_tokens", size(col("input_ids")).cast("long"))

  /** The composed nested-HOF encode, kept as the native
    * [[graft.plans.BpeEncode]] expression's equivalence witness
    * (CurationSpec pins native ≡ composed ≡ the classic twin). The
    * HOFs are CodegenFallback — ~10 interpreted ArrayData traversals
    * per word — which is why the native expression serves the hot
    * path. */
  private[graft] def encodeBpeComposed(docs: DataFrame, merges: Seq[(String, String)],
      vocab: Seq[String]): DataFrame = {
    val idOf = typedLit(vocab.zipWithIndex.toMap)
    val segmented = (w: Column) => merges.foldLeft(split(w, ""): Column) {
      case (c, (a, b)) => bpeMergeStep(c, a, b)
    }
    docs.select(col("doc_id"),
        flatten(transform(Text.tokens(col("text")),
          w => transform(segmented(w), s => coalesce(element_at(idOf, s), lit(-1)))))
          .as("input_ids"))
      .withColumn("n_tokens", size(col("input_ids")).cast("long"))
  }

  /** L64: BPE round-trip DECODE — ids back to text through the
    * vocabulary, the audit that proves the shipped tokenizer is
    * lossless before a trainer consumes its ids. BPE merges only ever
    * concatenate the original symbols, so decoding a word's segments
    * and joining them reconstructs the word exactly; word boundaries
    * are not marked in the id stream (no ▁-style prefix in this
    * tokenizer), so the reconstruction target is the text with spaces
    * removed. Unknown ids (−1) decode to "" — with the vocabulary
    * trained on the same corpus they arise only from empty words
    * (double spaces), which the space-stripped target also drops, so
    * `round_trip_ok` must be true for every document. Scan-side only:
    * the native encode kernel plus a per-row vocabulary lookup, zero
    * shuffles before the output sort. */
  def decodeBpe(docs: DataFrame, merges: Seq[(String, String)],
      vocab: Seq[String]): DataFrame = {
    val vlit = typedLit(vocab)
    val ids = graft.plans.GraftFunctions.bpeEncode(col("text"), merges, vocab)
    val decoded = array_join(transform(ids,
      id => when(id >= 0, element_at(vlit, id + 1)).otherwise(lit(""))), "")
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), decoded.as("decoded_text"))
      .select(col("doc_id"), col("decoded_text"),
        (col("decoded_text") === regexp_replace(col("text"), " ", ""))
          .as("round_trip_ok"))
      .orderBy("doc_id")
  }

  /** Training-ready packed sequences (L54) — the artifact an LLM
    * trainer actually consumes, closing the tokenize story end to end
    * (L46 train → L53 encode → pack → fixed-length `input_ids`):
    * documents encode scan-side, lay out in the deterministic
    * [[shardAssignments]]-style order (md5 order within md5-assigned
    * shards — re-run stable, additive), concatenate shard-locally and
    * split at `seqLen` boundaries; the final short sequence per shard
    * pads with −1 and carries its real token count.
    *
    * Scale: the layout window is per-shard (nothing global), the only
    * fact-scale exchange is the (shard, seq) regrouping of exploded
    * token positions — linear in corpus tokens with map-side combine
    * unavailable by nature (each row lands in exactly one sequence),
    * exactly how production packers parallelize. */
  def trainingSequences(docs: DataFrame, merges: Seq[(String, String)],
      vocab: Seq[String], seqLen: Int, shards: Int = 64): DataFrame = {
    val ord = hashKey(col("doc_id"))
    val shard = pmod(conv(substring(ord, 1, 8), 16, 10).cast("long"), lit(shards.toLong))
    val w = Window.partitionBy(col("pack_shard")).orderBy(col("__ord"), col("doc_id"))
    encodeBpe(docs, merges, vocab)
      .select(col("doc_id"), col("input_ids"), col("n_tokens"),
        ord.as("__ord"), shard.as("pack_shard"))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("pack_shard"), col("__start"),
        posexplode(col("input_ids")).as(Seq("__i", "__id")))
      .select(col("pack_shard"), (col("__start") + col("__i")).as("__pos"), col("__id"))
      .withColumn("seq_id", expr(s"__pos div ${seqLen}L"))
      .groupBy("pack_shard", "seq_id")
      .agg(count(lit(1)).as("n_tokens"),
        array_sort(collect_list(struct(col("__pos"), col("__id")))).as("__ps"))
      .select(col("pack_shard"), col("seq_id"), col("n_tokens"),
        concat(transform(col("__ps"), p => p.getField("__id")),
          array_repeat(lit(-1), lit(seqLen) - size(col("__ps")))).as("input_ids"))
      .orderBy("pack_shard", "seq_id")
  }

  /** Scalar checksum projection of [[trainingSequences]] — the L54
    * driver face. The driver gate sorts result rows with pandas over
    * raw cells, which cannot factorize array columns (VERDICT r7 #1),
    * so the registered frame carries per-sequence integer digests of
    * the `input_ids` payload — sum, first and last REAL token id
    * (padding `-1`s excluded) — beside the layout keys. The
    * array-producing operator stays the public surface; its exact
    * in-memory twin lives in CurationSpec. */
  def trainingSequenceChecksums(docs: DataFrame, merges: Seq[(String, String)],
      vocab: Seq[String], seqLen: Int, shards: Int = 64): DataFrame = {
    val real = slice(col("input_ids"), lit(1), col("n_tokens").cast("int"))
    trainingSequences(docs, merges, vocab, seqLen, shards)
      .select(col("pack_shard"), col("seq_id"), col("n_tokens"),
        aggregate(real, lit(0L), (acc, x) => acc + x).as("ids_sum"),
        element_at(col("input_ids"), 1).as("ids_head"),
        element_at(col("input_ids"), col("n_tokens").cast("int")).as("ids_tail"))
      .orderBy("pack_shard", "seq_id")
  }

  /** L56: tokenizer fertility report — the second multilingual-fairness
    * audit beside L51's OOV share: per language, how many BPE tokens
    * the trained tokenizer spends per word and per character
    * (Ács/Scao-style "fertility"). A language whose fertility is far
    * above the corpus mean pays more context budget per sentence —
    * the signal that the merge table under-serves it. Rides
    * [[applyBpe]]'s per-doc counts (scan-side merge replay, no
    * shuffle) into a language-sized rollup; ratios are half-up integer
    * micros over exact token/char sums — engine-exact arithmetic even
    * though the BPE replay itself has no ANSI oracle (rows-only; the
    * classic-twin contract lives in the L53 spec). */
  def fertilityReport(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val perDoc = applyBpe(docs, merges)
    docs.select(col("doc_id"), col("lang"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("__chars"))
      .join(perDoc, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("n_words"),
        sum(col("bpe_tokens")).as("n_bpe_tokens"),
        sum(col("__chars")).as("n_chars"))
      .withColumn("tokens_per_word", expr(
        "cast((2 * 1000000 * n_bpe_tokens + n_words) div (2 * n_words) as double)") / 1000000.0)
      .withColumn("tokens_per_char", expr(
        "cast((2 * 1000000 * n_bpe_tokens + n_chars) div (2 * n_chars) as double)") / 1000000.0)
      .orderBy("lang")
  }

  /** Corpus n-gram statistics (L35): top-k word n-grams by total
    * occurrence count with exact document frequency — the vocabulary
    * census a tokenizer-training or contamination-audit step starts
    * from. Positional n-grams (every occurrence counts toward tf, so a
    * doc repeating a phrase weighs by its repetitions), df counts each
    * document once.
    *
    * Scale: the gram stream is ≈ the corpus token count (one gram per
    * token position), and both aggregations are linear partial-agg
    * shuffles — (gram, doc) then gram — so hot grams combine map-side
    * twice before touching a reducer. The top-k is an orderBy+limit
    * that Spark executes as TakeOrderedAndProject (per-partition heaps,
    * no global sort, no vocabulary-sized driver state). */
  def ngramTopK(docs: DataFrame, n: Int = 2, k: Int = 30): DataFrame = {
    val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= n)
    val grams = toks.select(col("doc_id"),
      explode(transform(sequence(lit(0), size(col("__toks")) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(col("__toks"), i + j + 1)): _*)))
        .as("gram"))
    val perDoc = grams.groupBy("gram", "doc_id").agg(count(lit(1)).as("__c"))
    perDoc.groupBy("gram")
      .agg(sum(col("__c")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("gram"))
      .limit(k)
  }

  /** Top-k terms per document by tf-idf (L18): tf over (doc, term), df
    * over term, idf = ln(N/df) with N broadcast from one corpus-count
    * aggregate (no collected literal — plan shape stays constant). All
    * three aggregations are linear partial-agg shuffles; the per-doc
    * top-k window partitions by doc_id, which is never skewed. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
    // ONE tokenize+explode+rollup feeds both the df rollup and the
    // scoring join (uncached it runs twice)
    val tf = graft.OperatorCache.cached(
      toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("__n").cast("double") / col("__df")), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "tfidf", "rank")
  }

  /** BM25 top-k retrieval (L33): score every document against a small
    * set of keyword queries with Okapi BM25 (the Lucene `+1` idf
    * variant, so common terms with df > N/2 still contribute ≥ 0) and
    * keep the best k docs per query — the retrieval primitive a
    * curation pipeline uses for decontamination lookups, targeted
    * audits and seed-set expansion. Duplicate query terms count once.
    *
    * Scale (100 TB corpus, handful of queries): the corpus side is the
    * same two linear partial-agg shuffles tf-idf runs (tf per
    * (doc, term), df per term); the query term set is tiny and
    * BROADCAST, so candidate generation is a map-side semi-shaped join
    * keeping only documents that share a term with some query — no
    * corpus-wide shuffle keyed by query, and the scored set is bounded
    * by the posting lists of the query terms, not the corpus. The
    * per-(query, doc) sum uses L19's exact-decimal trick: each term
    * contribution is cut to DECIMAL(18,6) then summed exactly, so the
    * aggregate is bit-stable across partitionings and engines (float
    * sums are order-dependent; ln may differ in the last ulp). */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val withDl = docs.select(col("doc_id"), Text.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("__toks"), size(col("__toks")).cast("long").as("__dl"))
    // ONE tokenize+explode+rollup feeds both the df rollup and the
    // contribution join (uncached it runs twice; the stats 1-row agg
    // stays on the cheap pre-explode relation)
    val tf = graft.OperatorCache.cached(
      withDl.select(col("doc_id"), col("__dl"), explode(col("__toks")).as("term"))
        .groupBy("doc_id", "__dl", "term").agg(count(lit(1)).as("__tf")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val stats = withDl.agg(count(lit(1)).as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val qterms = queries.select(col("query_id"),
      explode(Text.tokens(col("qtext"))).as("term")).distinct()
    // every arithmetic step below is mirrored operation-for-operation in
    // the DuckDB oracle (same association, same double casts), so both
    // engines feed identical doubles into the decimal cut
    val contrib = tf.join(broadcast(qterms), "term")
      .join(dfreq, "term").crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        (log((col("__n").cast("double") - col("__df") + 0.5) /
             (col("__df").cast("double") + 0.5) + 1.0) *
          (col("__tf").cast("double") * (k1 + 1.0) /
            (col("__tf").cast("double") +
              lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / col("__avgdl")))))
          .cast("decimal(18,6)").as("__c"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("__c")).cast("decimal(18,6)").as("__score"))
    val w = Window.partitionBy("query_id").orderBy(col("__score").desc, col("doc_id"))
    // rank on the exact decimal; RENDER as double (both engines derive
    // the identical double from the identical decimal)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        col("__score").cast("double").as("score"), col("rank"))
  }

  /** L36: hashed-feature linear classifier inference (the fastText /
    * quality-classifier deployment shape: a trained weight vector over
    * hashed n-gram features, applied to every document). The weight
    * vector here is pseudo-trained — each bucket's weight derives from
    * md5 of the bucket id, so the oracle can rebuild it in SQL — but
    * the *inference plumbing* is the production one: features = hashed
    * word bigrams (the hashing trick bounds the model at `nBuckets`
    * regardless of vocabulary), weights = one broadcast literal array,
    * score = scan-riding dot product via higher-order functions.
    *
    * Scale: ZERO shuffles and zero joins — the whole score is a
    * projection (tokenize → bigram → hash → array lookup → aggregate)
    * that rides the parquet scan in whole-stage codegen, exactly how a
    * 100 TB quality-scoring pass must run. Integer weight accumulation
    * (millis in [-1000,1000]) keeps the sum order-independent and
    * engine-exact; only the final normalization touches doubles. */
  def classifierScore(docs: DataFrame, nBuckets: Int = 4096): DataFrame = {
    // pseudo-trained weight vector, derivable in ANSI SQL: w[b] =
    // first-8-hex-digits(md5("wt|b")) % 2001 - 1000  (millis)
    val md = java.security.MessageDigest.getInstance("MD5")
    val weights: Seq[Long] = (0 until nBuckets).map { b =>
      val hex = md.digest(s"wt|$b".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 2001 - 1000
    }
    val w = typedLit(weights)
    val toks = Text.tokens(col("text"))
    val grams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val bucket = (g: Column) =>
      (conv(substring(md5(concat(lit("w|"), g)), 1, 8), 16, 10).cast("long")
        % nBuckets).cast("int")
    docs.withColumn("__g", grams)
      .select(col("doc_id"), size(col("__g")).cast("long").as("n_grams"),
        aggregate(col("__g"), lit(0L), (acc, g) => acc + get(w, bucket(g))).as("__raw"))
      // NO round(): raw and n are exact integers (<2^53), so the bare
      // IEEE division is bit-identical across engines — whereas a
      // 6dp round() DIVERGES on representation ties (sf0.1 caught
      // 0.0629375: Spark rounds the double's exact decimal expansion
      // HALF_UP → …38, DuckDB rounds the scaled double → …37)
      .select(col("doc_id"), col("n_grams"),
        (col("__raw").cast("double") /
          (lit(1000.0) * greatest(col("n_grams"), lit(1L)))).as("score"))
      .withColumn("accept", col("score") > 0)
  }

  /** L50: linear quality-probe TRAINING over hashed bigram features —
    * the missing front half of [[classifierScore]]'s train→serve story
    * (L36 serves a weight vector; this learns one from labeled data at
    * corpus scale). Squared-loss batch gradient descent on the
    * fastText-style hashing-trick feature space, with every quantity an
    * EXACT INTEGER so the training run is bit-reproducible across
    * partitionings and engines (the driver query is hash-exact vs an
    * unrolled-SQL oracle — "deterministic distributed training" as a
    * checkable property, not a hope):
    *
    *  - features: hashed word-bigram counts (md5 % nBuckets, L36's
    *    bucket function) plus a constant bias feature at index
    *    `nBuckets`; labels in integer micros (1e6 = positive class);
    *  - step size 1/T with T = trace(XᵀX) = Σx² — a data-derived upper
    *    bound on the quadratic-loss curvature, so descent never
    *    diverges regardless of corpus scale, and T is itself one exact
    *    integer aggregate;
    *  - update: w ← w − sdiv(g, T) in half-away-from-zero integer
    *    micros ([[Ann.labelCentroids]]'s division discipline).
    *
    * Scale: the feature relation (doc, bucket, x) is built by ONE
    * map-side-combined fact shuffle and cached — each iteration is then
    * two linear aggregates over it (per-doc prediction, per-bucket
    * gradient) with the model joining in as an O(nBuckets) broadcast
    * literal; per-iteration driver traffic is the nBuckets+1-row model,
    * never the corpus. The FINAL iteration's gradient aggregate returns
    * as the result (kmeansTrain's contract): (bucket, weight_micros,
    * weight) for every feature bucket the corpus touches. */
  def trainClassifier(docs: DataFrame, positive: Column,
      nBuckets: Int = 64, iters: Int = 2): DataFrame = {
    require(iters >= 1, "trainClassifier needs at least one GD iteration")
    val toks = Text.tokens(col("text"))
    val grams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val bucket = (conv(substring(md5(concat(lit("w|"), col("__g"))), 1, 8), 16, 10)
      .cast("long") % nBuckets).cast("int")
    // cached hash-partitioned on doc_id: every iteration's per-doc
    // prediction groupBy AND its doc_id gradient join reuse this one
    // partitioning — without it each of the `iters` iterations pays two
    // fact-scale exchanges of the feature relation
    val xb = graft.OperatorCache.cached(
      docs.select(col("doc_id"), explode(grams).as("__g"))
        .select(col("doc_id"), bucket.as("bucket"))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("x"))
        .unionByName(docs.select(col("doc_id"),
          lit(nBuckets).as("bucket"), lit(1L).as("x")))
        .repartition(col("doc_id")))
    val labels = docs.select(col("doc_id"),
      when(positive, lit(1000000L)).otherwise(lit(0L)).as("__t"))
    // empty-input guard (ADVICE r7): on an empty corpus the SUM
    // aggregate is NULL and the NPE/ArithmeticException would surface
    // deep inside sdiv — fail with the actual cause instead
    val traceRow = xb.agg(sum(col("x") * col("x"))).head
    require(!traceRow.isNullAt(0) && traceRow.getLong(0) > 0L,
      "trainClassifier: empty corpus — no feature rows to derive the 1/trace step size from")
    val trace = traceRow.getLong(0)
    // half-away-from-zero integer division by the trace (in-plan twin
    // of sdivL; `div` exists only in SQL text, labelCentroids' idiom)
    def sdiv(gName: String): Column = expr(
      s"cast(signum($gName) as bigint) * ((2 * abs($gName) + ${trace}L) div (2 * ${trace}L))")
    // per-bucket gradient of the squared loss at the current weights
    def grad(w: Array[Long]): DataFrame = {
      val wLit = typedLit(w.toSeq)
      val p = xb.withColumn("__w", get(wLit, col("bucket")))
        .groupBy("doc_id").agg(sum(col("__w") * col("x")).as("__p"))
      val e = labels.join(p, "doc_id")
        .select(col("doc_id"), (col("__p") - col("__t")).as("__e"))
      xb.join(e, "doc_id")
        .groupBy("bucket").agg(sum(col("__e") * col("x")).as("__g"))
    }
    var w: Array[Long] = Array.fill(nBuckets + 1)(0L)
    for (_ <- 1 until iters) {
      val g = grad(w).collect()
      val next = w.clone()
      g.foreach(r => next(r.getInt(0)) = next(r.getInt(0)) - sdivL(r.getLong(1), trace))
      w = next
    }
    val wLit = typedLit(w.toSeq)
    grad(w)
      .select(col("bucket"),
        (get(wLit, col("bucket")) - sdiv("__g")).as("weight_micros"))
      .withColumn("weight", col("weight_micros").cast("double") / 1000000.0)
      .orderBy("bucket")
  }

  /** Driver-side half-away-from-zero integer division — the exact twin
    * of the in-plan sdiv above, applied to collected gradient rows. */
  private def sdivL(g: Long, t: Long): Long =
    java.lang.Long.signum(g) * ((2L * math.abs(g) + t) / (2L * t))

  /** Scan-riding inference under a TRAINED hashed-feature model (the
    * serving expression of [[trainClassifier]]'s train→serve pair):
    * Σ w[bucket(bigram)]·count + w[bias] in exact integer micros, as a
    * single projection over `text` — zero shuffles, zero joins, the
    * same feature definition the trainer optimized (bucket function
    * and bias index included), so a served score is exactly the
    * quantity training minimized the loss of. `weights` has nBuckets+1
    * entries, bias last — [[trainClassifier]]'s output shape. Shared by
    * the batch eval and the streaming gate (S24) so the two can't
    * drift. */
  def linearScoreMicros(weights: IndexedSeq[Long]): Column = {
    val nBuckets = weights.length - 1
    val toks = Text.tokens(col("text"))
    val grams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val wLit = typedLit(weights)
    val bucket = (g: Column) =>
      (conv(substring(md5(concat(lit("w|"), g)), 1, 8), 16, 10)
        .cast("long") % nBuckets).cast("int")
    aggregate(grams, lit(weights(nBuckets)), (acc, g) => acc + get(wLit, bucket(g)))
  }

  /** L52: classifier calibration / curriculum-mix report — the audit
    * that closes the L50→L36 loop: bucket every document by its served
    * score (fixed-width integer-micros buckets) and report each
    * bucket's size and positive-label share. Monotone share across
    * buckets = the model actually ranks quality (calibration); the
    * bucket sizes are the curriculum mix a score-thresholded training
    * run would draw from. EXACT end to end: scores are
    * [[linearScoreMicros]] longs, the floor bucket is computed as
    * (p − posmod(p, W)) / W — an exact multiple of W, so truncating
    * and flooring division agree in every engine on negative scores
    * too — and the share is half-up integer micros.
    *
    * Scale: ONE scan-riding scoring projection (the L36 serving shape)
    * into a bucket-sized aggregate — no joins, no windows over the
    * corpus. */
  def scoreCalibration(docs: DataFrame, positive: Column,
      weights: IndexedSeq[Long], bucketMicros: Long = 1000L): DataFrame =
    docs.select(positive.cast("int").cast("long").as("__y"),
        linearScoreMicros(weights).as("__p"))
      .withColumn("bucket", expr(
        s"(__p - ((__p % $bucketMicros) + $bucketMicros) % $bucketMicros) div $bucketMicros"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("__y")).as("n_pos"))
      .withColumn("pos_share", expr(
        "cast((2 * 1000000 * n_pos + n_docs) div (2 * n_docs) as double)") / 1000000.0)
      .withColumn("score_lo",
        (col("bucket") * bucketMicros).cast("double") / 1000000.0)
      .select("bucket", "score_lo", "n_docs", "n_pos", "pos_share")
      .orderBy("bucket")

  /** L37: hashed-n-gram importance resampling (DSIR, Xie et al. 2023,
    * arXiv:2302.03169): re-weight a raw corpus toward a target
    * distribution using importance ratios over hashed unigram features
    * — the principled form of "select web text that looks like
    * Wikipedia". Feature space = `nBuckets` hashed buckets; both the
    * target and source unigram distributions live there (add-1
    * smoothed), so the model is O(nBuckets) however large either
    * corpus is. A document's log importance weight is the sum of its
    * tokens' log p_target/p_source bucket ratios; the top-k by weight
    * is the deterministic greedy resample (the stochastic Gumbel-top-k
    * form replaces the ORDER BY key with logw + Gumbel noise).
    *
    * Scale: ONE fact-side aggregation — (doc, bucket) token counts,
    * map-side combined. The bucket count table and the corpus totals
    * both REDUCE from it (nBuckets-sized inputs, no second corpus
    * scan), which is why the per-doc counts are cached: they feed the
    * model and the scoring join. The ratio table joins back un-hinted
    * (AQE broadcasts its nBuckets rows; same rule as unigramLogprob's
    * term join). Ratios are cut to DECIMAL(18,6) before the per-doc
    * sum (L19's exactness trick), so the weight is bit-stable across
    * partitionings and engines. */
  def importanceResample(docs: DataFrame, targetPred: Column,
      nBuckets: Int = 2048, k: Int = 100): DataFrame = {
    val toks = docs.select(col("doc_id"), targetPred.as("__is_t"),
      explode(Text.tokens(col("text"))).as("__wd"))
    val bucketed = toks.select(col("doc_id"), col("__is_t"),
      (conv(substring(md5(concat(lit("f|"), col("__wd"))), 1, 8), 16, 10)
        .cast("long") % nBuckets).as("__b"))
    // __is_t is doc-level-constant, so carrying it in the grouping key
    // changes nothing about the (doc, bucket) granularity
    val perDoc = graft.OperatorCache.cached(
      bucketed.groupBy("doc_id", "__is_t", "__b").agg(count(lit(1)).as("__c")))
    val cnt = perDoc.groupBy("__b").agg(
      sum(col("__c")).as("__cs"),
      sum(when(col("__is_t"), col("__c")).otherwise(0L)).as("__ct"))
    val tot = cnt.agg(sum(col("__cs")).as("__ns"), sum(col("__ct")).as("__nt"))
    // one fused form, mirrored operation-for-operation in the oracle:
    // ln( (ct+1)(ns+B) / ((cs+1)(nt+B)) ), cut to exact decimal
    val ratio = cnt.crossJoin(broadcast(tot)).select(col("__b"),
      round(log(((col("__ct") + lit(1.0)) * (col("__ns") + lit(nBuckets.toDouble))) /
                ((col("__cs") + lit(1.0)) * (col("__nt") + lit(nBuckets.toDouble)))), 6)
        .cast("decimal(18,6)").as("__r"))
    perDoc.join(ratio, "__b")
      .groupBy("doc_id")
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c").cast("decimal(12,0)") * col("__r")).as("__lw"))
      .select(col("doc_id"), col("n_tokens"),
        col("__lw").cast("double").as("log_weight"))
      .orderBy(col("log_weight").desc, col("doc_id"))
      .limit(k)
  }

  /** L38: RAG-style sliding-window chunking — each document fans out to
    * overlapping word-window chunks with stable (doc_id, chunk_idx)
    * identity (the retrieval-corpus preparation step between curation
    * and embedding). Pure array algebra riding the scan (sequence →
    * transform-slice → posexplode), fully codegen'd — no UDF and no
    * shuffle except the output ORDER BY; at 100 TB the fan-out is
    * embarrassingly parallel and per-row chunk count is bounded by the
    * window/stride knobs. The last chunk may be shorter than `window`
    * but is never empty (the chunk-count formula keeps every start
    * strictly inside the document). */
  def chunkDocuments(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window, "need 0 < stride <= window")
    val toks = split(col("text"), " ")
    val nChunks = when(size(toks) <= window, lit(1))
      .otherwise(lit(1) + ceil((size(toks) - window).cast("double") / stride).cast("int"))
    docs.select(col("doc_id"), toks.as("__toks"), nChunks.as("__nc"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("__nc") - 1),
          i => slice(col("__toks"), i * stride + 1, lit(window)))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).as("n_tokens"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** L62: lexical-diversity profile per source — the corpus-mix
    * diagnostics a data curator reads before weighting sources:
    * type-token ratio (vocabulary richness), hapax share (how much of
    * the vocabulary is seen once — the Zipf tail mass), and top-term
    * share (how head-heavy the distribution is; near 1 means a
    * degenerate/boilerplate source). All ratios are exact integer
    * micros (floor(x·10⁶)), so the whole report is ANSI-oracle-exact.
    *
    * Scale: one (source, term) aggregate — map-side combined, so the
    * exchange carries per-mapper distinct terms, not corpus tokens —
    * then a per-source rollup of that already-small relation; the
    * per-source doc count rides a third, trivially small exchange.
    * Nothing corpus-scale crosses the wire. */
  def lexicalDiversity(docs: DataFrame): DataFrame = {
    val tf = docs.filter(col("text").isNotNull)
      .select(col("source"), explode(Text.tokens(col("text"))).as("__w"))
      .groupBy("source", "__w").agg(count(lit(1)).as("__f"))
    val stats = tf.groupBy("source").agg(
      sum(col("__f")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("__f") === 1, 1L).otherwise(0L)).as("n_hapax"),
      max(col("__f")).as("top_f"))
    docs.filter(col("text").isNotNull)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(stats, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_types"),
        col("n_hapax"), col("top_f"),
        expr("n_types * 1000000 div n_tokens").as("ttr_micros"),
        expr("n_hapax * 1000000 div n_tokens").as("hapax_micros"),
        expr("top_f * 1000000 div n_tokens").as("top_micros"))
      .orderBy("source")
  }

  /** L75: corpus drift between two table GENERATIONS — the "what did
    * that refresh actually do to my training mix" audit a recurring
    * ingest owes its consumers: per source, documents added / removed /
    * rewritten and the net token delta, folded from a C25 change feed
    * ([[graft.store.TableStore.readChanges]]).
    *
    * Scale: the input is the change feed, which reads O(changed files),
    * never the base table — so the report costs O(changes) + one
    * map-side-combined rollup to a source-sized relation. A 100-row
    * nightly delta against a 100 TB corpus reports in seconds; diffing
    * two full snapshot reads (the naive plan) would scan both. Token
    * counts come from the changed rows' text itself (whitespace
    * tokens, the L10 convention), so a stale n_chars column cannot
    * skew the delta. Sources only TOUCHED by the interval appear —
    * an absent source means "nothing happened", by construction. */
  /** L76: per-document curation VERDICT with reason codes — the
    * debuggable per-row form of the L13 aggregate pipeline, and the
    * audit table a curation rollout owes its data owners (the
    * Dolma-attributes pattern): every document gets its FIRST failing
    * gate, in a fixed precedence, or `keep`.
    *
    * Precedence is cheapest-first — the four scan-riding gates (empty,
    * lang_mismatch via L14's langId, low_quality via L16's gate,
    * repetitive via L26's combined flag) shadow the one gate that
    * needs an exchange (exact-duplicate loser: the L1 md5 winner
    * rule, one O(distinct texts) map-side-combined aggregate joined
    * back). The gate DEFINITIONS are the existing operators' columns,
    * shared verbatim — this surface re-labels them, it cannot drift
    * from them. Scale: one corpus scan + the winner aggregate;
    * nothing else crosses the wire. */
  /** Shared verdict derivation for L76/L77: one corpus scan + the
    * winner aggregate, emitting the per-document verdict plus the
    * whitespace token count the L77 rollup weighs by. */
  private def verdictFrame(docs: DataFrame): DataFrame = {
    val q = Text.qualityColumns(col("text")).toMap
    val r = Text.repetitionColumns(col("text")).toMap
    val base = docs.select(col("doc_id"), col("lang"), col("source"), col("text"),
      Text.langId(col("text")).as("__pred"),
      q("n_words").as("__nw"), q("quality").as("__q"), r("repetitive").as("__rep"))
    val winners = docs.filter(col("text").isNotNull)
      .groupBy(md5(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("__keep"))
    base.join(winners, md5(base("text")) === winners("__h"), "left")
      .select(col("doc_id"), col("source"),
        when(col("text").isNull || col("__nw") < 10, "empty")
          .when(col("__pred") =!= col("lang"), "lang_mismatch")
          .when(!col("__q"), "low_quality")
          .when(col("__rep"), "repetitive")
          .when(col("doc_id") =!= col("__keep"), "duplicate")
          .otherwise("keep").as("verdict"),
        when(col("text").isNull, 0L)
          .otherwise(size(split(col("text"), " ")).cast("long")).as("__ntok"))
  }

  def curationVerdicts(docs: DataFrame): DataFrame =
    verdictFrame(docs).select("doc_id", "source", "verdict").orderBy("doc_id")

  /** L77: per-source data card — the datasheet a corpus ships with:
    * for each source, how many documents arrived, how each curation
    * gate disposed of them (the L76 first-failing-gate codes), and the
    * token inventory before and after curation. The numbers a data
    * owner quotes ("source X: 12M docs in, 9.1M kept, 4.2B of 5.0B
    * tokens survive") and the drift baseline the next refresh's card
    * is compared against. Rides the SAME verdict derivation as L76
    * (shared [[verdictFrame]] — the card cannot disagree with the
    * per-document verdicts), then ONE map-side-combined rollup to
    * S rows; nothing else crosses the wire. */
  def dataCard(docs: DataFrame): DataFrame = {
    def nv(v: String) = sum(when(col("verdict") === v, 1L).otherwise(0L))
    verdictFrame(docs).groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      nv("keep").as("n_keep"),
      nv("empty").as("n_empty"),
      nv("lang_mismatch").as("n_lang_mismatch"),
      nv("low_quality").as("n_low_quality"),
      nv("repetitive").as("n_repetitive"),
      nv("duplicate").as("n_duplicate"),
      sum(col("__ntok")).as("total_tokens"),
      sum(when(col("verdict") === "keep", col("__ntok")).otherwise(0L))
        .as("kept_tokens"))
      .orderBy("source")
  }

  /** L80: Unicode NFC normalization pass — the canonical-composition
    * scrub a corpus takes before anything content-addressed runs: two
    * byte-different encodings of the same visible string ("e"+U+0301
    * vs "é") otherwise defeat exact dedup (L1's md5 winner), rolling
    * fingerprints (L11) and shingle hashes (L2). One scan through the
    * native codegen'd [[graft.plans.NfcNormalize]] expression, whose
    * isNormalized fast path returns the input buffer untouched — on
    * real corpora nearly every document is already NFC, so the hot
    * path allocates nothing. `changed` flags the rewritten documents
    * (the audit trail a scrub job reports). */
  def nfcNormalizeDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.plans.GraftFunctions.nfcNormalize(col("text")).as("text_nfc"),
        col("text"))
      .select(col("doc_id"), col("text_nfc"),
        (col("text") =!= col("text_nfc")).as("changed"))
      .orderBy("doc_id")

  def corpusDrift(changes: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val ntok = coalesce(size(split(col(textCol), " ")).cast("long"), lit(0L))
    val ct = col("_change_type")
    changes
      .groupBy(col(groupCol).as("source"))
      .agg(
        sum(when(ct === "insert", 1L).otherwise(0L)).as("n_added"),
        sum(when(ct === "delete", 1L).otherwise(0L)).as("n_removed"),
        sum(when(ct === "update_postimage", 1L).otherwise(0L)).as("n_changed"),
        sum(when(ct === "insert" || ct === "update_postimage", ntok)
          .when(ct === "delete" || ct === "update_preimage", -ntok)
          .otherwise(0L)).as("tok_delta"))
      .select(col("source"), col("n_added"), col("n_removed"), col("n_changed"),
        (col("n_added") - col("n_removed")).as("doc_delta"), col("tok_delta"))
      .orderBy("source")
  }
}
