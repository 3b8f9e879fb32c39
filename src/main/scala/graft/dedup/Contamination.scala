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
      tau: Double = 0.2): DataFrame = {
    val parallelism = train.sparkSession.sparkContext.defaultParallelism
    def shingles(df: DataFrame) =
      df.filter(size(Text.tokens(col("text"))) >= n)
        .repartition(parallelism) // scatter compute-bound shingling
        .select(col("doc_id"),
          explode(transform(Text.wordShingles(col("text"), n), s => xxhash64(s))).as("__s"))
    val trainSh = trainShingleSet(train, n)
    val evalSh = shingles(eval)
    val totals = evalSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hits = evalSh.join(trainSh, Seq("__s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    totals.join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
      .withColumn("flagged", col("contamination") >= tau)
      .select("doc_id", "n_shingles", "n_contaminated", "contamination", "flagged")
  }
}
