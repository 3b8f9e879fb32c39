package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.TableStore

/** Mutation-path micro-bench (SURVEY §7): isolates what the managed
  * store's write path adds on top of a raw parquet append —
  *
  *   raw_append     df.write.parquet, no validation, no layout (floor)
  *   insert         one-pass bounds/NOT-NULL validation aggregate +
  *                  bucketed append
  *   upsert_10pct   keyed merge touching ~10% of rows → staged-swap
  *                  rewrite of the touched buckets
  *   upsert_narrow  keyed merge touching ~0.1% of rows → bucket pruning
  *                  should rewrite only a few buckets (the 100 TB case:
  *                  a trickle of updates must not rewrite the table)
  *
  * Usage: runMain graft.tools.ProfileMut <sfDir> [n]
  */
object ProfileMut {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = graft.GraftSession.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .cache()
    orders.count()

    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[mut] $tag%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    for (i <- 0 until n) {
      println(s"[mut] --- pass $i (orders rows: ${orders.count()}) ---")
      val scratch = java.nio.file.Files.createTempDirectory("graft_mut_").toString
      timed("raw_append") {
        orders.write.mode("append").parquet(s"$scratch/raw")
      }
      val store = new TableStore(spark, s"$scratch/store")
      store.createTable("o", Seq(
        "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
        "o_orderstatus" -> "varchar(1)", "o_totalprice" -> "decimal(12,2)",
        "o_orderpriority" -> "varchar(15)"), Seq("o_orderkey"), buckets = 32)
      timed("insert") {
        store.insert("o", orders)
      }
      val bulk = orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1)
      timed("upsert_10pct") {
        store.upsert("o", bulk)
      }
      val trickle = orders.filter(col("o_orderkey") % 1000 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1)
      timed("upsert_narrow") {
        store.upsert("o", trickle)
      }
      // 3 distinct keys → ≤3 of 32 buckets rewritten: the pruning win.
      // (the %1000 trickle above spreads 150 keys over all 32 hash
      // buckets, so it measures the no-pruning-possible floor — with
      // cluster-scale bucket counts, 150 keys touch ≪1% of buckets)
      val pin = orders.filter(col("o_orderkey").isin(1L, 2L, 3L))
        .withColumn("o_totalprice", col("o_totalprice") + 1)
      timed("upsert_3keys") {
        store.upsert("o", pin)
      }
    }
    spark.stop()
  }
}
