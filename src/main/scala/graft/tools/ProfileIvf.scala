package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for topKIvf. */
object ProfileIvf {
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.GraftSession.table(spark, sfDir, "embeddings")
    val queries = emb.orderBy(xxhash64(col("vec_id"))).limit(10)
    for (i <- 0 until 2) {
      spark.catalog.clearCache()
      time(s"[$i] corpus count")(emb.count())
      val cents = time(s"[$i] train 5 iters")(
        graft.similarity.Ann.trainIvfCentroids(emb, 16, 5))
      time(s"[$i] full topKIvf")(
        graft.similarity.Ann.topKIvf(emb, queries, 5).count())
      println(s"[ivf] cents=${cents.size}x${cents.headOption.map(_.size).getOrElse(0)}")
    }
    spark.stop()
  }
}
