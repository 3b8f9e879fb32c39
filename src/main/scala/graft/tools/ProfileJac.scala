package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for ngramJaccardPairs. */
object ProfileJac {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.GraftSession.table(spark, sfDir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[jac] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val n = 3; val bandWidth = 50
    for (i <- 0 until 2) {
      spark.catalog.clearCache()
      time(s"[$i] docs.count")(docs.count())
      val toks = docs
        .withColumn("__band", (col("n_chars") / bandWidth).cast("int"))
        .filter(size(graft.functions.Text.tokens(col("text"))) >= n)
      time(s"[$i] toks.count")(toks.count())
      val sc = toks.repartition(spark.sparkContext.defaultParallelism)
      val sh = sc.select(col("doc_id"), col("lang"), col("__band"),
        graft.functions.Text.wordShingles(col("text"), n).as("__sh"))
      time(s"[$i] sh shingle+count")(sh.count())
      val ex = sh.select(col("doc_id"), col("lang"), col("__band"),
        explode(transform(col("__sh"), s => xxhash64(s))).as("__s"))
      time(s"[$i] ex explode")(ex.count())
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lang", "__band", "__s")
      val kept = ex.withColumn("__df", count(lit(1)).over(w))
        .filter(col("__df") <= 128).drop("__df")
      time(s"[$i] kept window")(kept.count())
      val k2 = kept.persist()
      time(s"[$i] kept persist")(k2.count())
      val a = k2.select(col("doc_id").as("a_id"), col("lang"), col("__band"), col("__s"))
      val b = k2.select(col("doc_id").as("b_id"), col("lang").as("__lb"), col("__band").as("__bb"), col("__s").as("__sb"))
      val inter = a.join(b,
          col("__s") === col("__sb") && col("lang") === col("__lb") &&
            col("__band") === col("__bb") && col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("__inter"))
      time(s"[$i] inter join")(inter.count())
      k2.unpersist()
      val full = graft.dedup.Dedup.ngramJaccardPairs(docs)
      time(s"[$i] full")(full.count())
      val fullOrd = graft.dedup.Dedup.ngramJaccardPairs(docs).orderBy("a_id", "b_id")
      time(s"[$i] full+orderBy")(fullOrd.count())
    }
    spark.stop()
  }
}
