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
    toks.join(logp, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__lp")).as("__sum"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__sum").cast("double") / col("n_tokens"), 6).as("avg_logprob"))
  }

  /** Top-k terms per document by tf-idf (L18): tf over (doc, term), df
    * over term, idf = ln(N/df) with N broadcast from one corpus-count
    * aggregate (no collected literal — plan shape stays constant). All
    * three aggregations are linear partial-agg shuffles; the per-doc
    * top-k window partitions by doc_id, which is never skewed. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
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
}
