package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle contract for operator-persisted intermediates (VERDICT r5
  * #8): operators register every persist with [[OperatorCache]], and
  * `Graft.clearOperatorCaches()` releases exactly those — so a
  * long-lived session that clears at batch boundaries holds a bounded
  * cache footprint, and user-owned caches in the same session survive
  * the clear.
  *
  * Assertions diff persistent-RDD ID SETS against a pre-test baseline
  * rather than asserting emptiness: earlier suites' localCheckpoint
  * RDDs linger until GC and are outside this contract. */
class OperatorCacheSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def persistedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def docs = {
    import spark.implicits._
    (1 to 40).map { i =>
      val text =
        if (i % 4 == 0) "the quick brown fox jumps over the lazy dog near the river bank"
        else s"document number $i talks about topic ${i % 7} with some shared phrasing and a unique tail $i"
      (i.toLong, "en", text, text.length)
    }.toDF("doc_id", "lang", "text", "n_chars")
  }

  test("operator persists are registered and released by clearOperatorCaches") {
    Graft.clearOperatorCaches()
    val base = persistedIds

    val d = docs
    dedup.Dedup.ngramJaccardPairs(d).count()
    assert(OperatorCache.size > 0, "the jaccard pass must register its df-cut cache")
    assert((persistedIds -- base).nonEmpty, "the run must have persisted something new")

    Graft.clearOperatorCaches()
    assert(OperatorCache.size == 0)
    assert((persistedIds -- base).isEmpty,
      "clearOperatorCaches must unpersist every RDD the operators persisted")
  }

  test("no cache growth across a 50-query loop with per-batch clears") {
    Graft.clearOperatorCaches()
    val d = docs
    val base = persistedIds
    for (i <- 1 to 50) {
      if (i % 3 == 0) dedup.Dedup.simhashPairs(d).count()
      else dedup.Dedup.ngramJaccardPairs(d).count()
      Graft.clearOperatorCaches()
      assert(OperatorCache.size == 0, s"registry must drain every iteration (i=$i)")
      assert((persistedIds -- base).isEmpty,
        s"persisted RDDs must not accumulate across the loop (i=$i)")
    }
  }

  test("user caches in the same session survive an operator-cache clear") {
    import spark.implicits._
    val user = (1 to 10).toDF("x").persist()
    try {
      user.count()
      dedup.Dedup.ngramJaccardPairs(docs).count()
      Graft.clearOperatorCaches()
      assert(user.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "a user-owned cache must survive clearOperatorCaches")
    } finally {
      user.unpersist()
    }
  }
}
