package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Train/eval contamination check (benchmark decontamination): for each
  * eval document, the fraction of its word-n-gram shingles that appear
  * anywhere in the train corpus. The standard leakage gate an LLM data
  * pipeline runs before training (eval sets must not be memorizable
  * from train).
  *
  * Scale shape (SURVEY §5): the train side reduces to DISTINCT 8-byte
  * shingle hashes — one linear groupBy shuffle, no pairing, no blocks —
  * and the eval side LEFT SEMI joins against it on the hash. At 100 TB
  * train / small eval the semi-join broadcasts the EVAL shingles and
  * streams the train side (Spark picks this with AQE when eval is
  * small); nothing is ever quadratic. Collision odds on 64-bit hashes
  * are ~2^-64 per (train,eval) shingle pair.
  */
object Contamination {

  /** Per-eval-doc contamination: (doc_id, n_shingles, n_contaminated,
    * contamination, flagged). Docs with fewer than n tokens are skipped
    * (no shingles → no evidence either way). */
  /** Distinct train-corpus shingle hashes — the reusable "index" side of
    * the gate (the streaming twin joins a live stream against it). */
  def trainShingleSet(train: DataFrame, n: Int = 5): DataFrame = {
    val parallelism = train.sparkSession.sparkContext.defaultParallelism
    train.filter(size(Text.tokens(col("text"))) >= n)
      .repartition(parallelism) // scatter compute-bound shingling
      .select(explode(transform(Text.wordShingles(col("text"), n), s => xxhash64(s))).as("__s"))
      .distinct()
  }

  def overlap(
      train: DataFrame,
      eval: DataFrame,
      n: Int = 5,
      tau: Double = 0.2): DataFrame =
    overlapWithIndex(trainShingleSet(train, n), eval, n, tau)

  /** The gate against a PREBUILT shingle index (see [[saveIndex]]):
    * decouples the expensive train-side pass from each eval check. */
  def overlapWithIndex(
      trainShingles: DataFrame,
      eval: DataFrame,
      n: Int = 5,
      tau: Double = 0.2): DataFrame = {
    val parallelism = eval.sparkSession.sparkContext.defaultParallelism
    // ONE eval shingling pass feeds the totals and the hit counts
    // (uncached, the tokenize+shingle+hash pipeline runs twice)
    val evalSh = graft.OperatorCache.cached(
      eval.filter(size(Text.tokens(col("text"))) >= n)
        .repartition(parallelism) // scatter compute-bound shingling
        .select(col("doc_id"),
          explode(transform(Text.wordShingles(col("text"), n), s => xxhash64(s))).as("__s")))
    val totals = evalSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hits = evalSh.join(trainShingles, Seq("__s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    totals.join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
      .withColumn("flagged", col("contamination") >= tau)
      .select("doc_id", "n_shingles", "n_contaminated", "contamination", "flagged")
  }

  /** Persist the train-shingle index as a managed bucketed store table
    * keyed by the shingle hash. Built ONCE over the train corpus and
    * reused by every subsequent gate; maintained incrementally — new
    * train partitions upsert their shingles (the PK keeps the set
    * distinct, bucket pruning keeps small additions cheap), so the
    * index follows the corpus without full rebuilds. */
  def saveIndex(
      store: graft.store.TableStore,
      table: String,
      train: DataFrame,
      n: Int = 5,
      buckets: Int = 32): Unit = {
    if (!store.exists(table))
      store.createTable(table, Seq("s" -> "bigint"), Seq("s"), buckets = buckets)
    store.upsert(table, trainShingleSet(train, n).withColumnRenamed("__s", "s"))
  }

  def loadIndex(store: graft.store.TableStore, table: String): DataFrame =
    store.read(table).select(col("s").as("__s"))

  /** Collect the distinct train-shingle hashes into a SORTED array for
    * broadcast membership tests: the single-stateful-pass streaming
    * admission gate ([[graft.streaming.Streams.admissionGate]]) needs
    * per-doc membership WITHOUT a join or a second stateful aggregation
    * (Spark disallows flatMapGroupsWithState downstream of a streaming
    * aggregation). 8 bytes per distinct shingle; `maxShingles` guards
    * the driver/broadcast footprint (default 2^24 ≈ 128 MB, a practical
    * broadcast ceiling). A train corpus whose distinct-shingle count
    * exceeds the cap raises rather than OOMing — at that scale use the
    * distributed two-query path (S8 gate into a table, then the batch
    * quota) instead of the fused single pass. */
  /** Bloom-filter train index for membership gates past the exact-array
    * broadcast ceiling: size is set by (expected items, fpp), not corpus
    * size — 10^9 shingles at 1% fpp is ~1.2 GB, at the edge of
    * broadcastability; the exact semi-join path has no ceiling at all.
    * Deterministic for a given train set (hash-OR construction is
    * order-independent). Counts the distinct set once to size the
    * filter. */
  def bloomIndex(train: DataFrame, n: Int = 5, fpp: Double = 1e-4): org.apache.spark.util.sketch.BloomFilter = {
    val sh = graft.OperatorCache.cached(trainShingleSet(train, n))
    sh.stat.bloomFilter("__s", math.max(sh.count(), 1L), fpp)
  }

  def collectIndex(train: DataFrame, n: Int = 5, maxShingles: Int = 1 << 24): Array[Long] = {
    val arr = trainShingleSet(train, n).limit(maxShingles + 1).collect().map(_.getLong(0))
    if (arr.length > maxShingles)
      throw new IllegalStateException(
        s"collectIndex: train shingle set exceeds maxShingles=$maxShingles — " +
          "use the distributed gate (overlapWithIndex / Streams.contaminationGate)")
    java.util.Arrays.sort(arr)
    arr
  }

  /** L70: SEMANTIC train/eval contamination — the embedding-space half
    * of the leakage gate beside the lexical shingle check above: an
    * eval item is contaminated when some train vector sits within
    * cosine ≥ tau of it (paraphrased leakage the n-gram gate cannot
    * see). Per eval vector: its best train match (max cosine, ties to
    * the smaller train id — the 6-dp fixed cosine leaves no
    * engine-dependent ties) and the verdict; eval items with no
    * same-block train candidate report clean with a NULL match.
    *
    * Scale shape: candidates pair ONLY within a block (here a label;
    * at corpus scale the L34 coarse-quantizer cell plays that role),
    * so the join is block-partitioned — one shuffle per side, per-cell
    * candidate sets bounded by the blocking contract, nothing
    * all-pairs. The argmax is a window partitioned BY EVAL VECTOR
    * (never a global window); eval is typically ≪ train, and AQE
    * broadcasts the eval side of the block join. */
  def semanticContamination(
      train: DataFrame,
      eval: DataFrame,
      tau: Double = 0.35,
      blockCol: String = "label"): DataFrame = {
    import graft.functions.Vectors
    val tr = train.select(col("vec_id").as("train_id"),
      col(blockCol).as("__blk"), Vectors.toDouble(col("embedding")).as("__tv"))
    // ev feeds the candidate join AND the keep-every-eval left join
    val ev = graft.OperatorCache.cached(
      eval.select(col("vec_id").as("eval_id"),
        col(blockCol).as("__blk"), Vectors.toDouble(col("embedding")).as("__ev")))
    val cand = ev.join(tr, "__blk")
      .select(col("eval_id"), col("train_id"),
        Vectors.cosine6(col("__ev"), col("__tv")).as("__cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("eval_id").orderBy(col("__cos").desc, col("train_id"))
    val best = cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("eval_id"), col("train_id").as("best_train"),
        col("__cos").as("best_cosine"), (col("__cos") >= tau).as("contaminated"))
    ev.select("eval_id").join(best, Seq("eval_id"), "left")
      .select(col("eval_id"), col("best_train"), col("best_cosine"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
      .orderBy("eval_id")
  }
}
