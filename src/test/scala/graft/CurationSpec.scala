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

  test("stratifiedCap respects the cap even when salts exceed group size") {
    val out = Curation.stratifiedCap(docs, "lang", "doc_id", cap = 7, salts = 64)
    val sizes = out.groupBy("lang").count().collect().map(_.getLong(1))
    assert(sizes.nonEmpty && sizes.forall(_ <= 7))
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
}
