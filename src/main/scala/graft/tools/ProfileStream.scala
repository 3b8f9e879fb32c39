package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the S6 streaming minhash micro-bench path.
  * Usage: runMain graft.tools.ProfileStream <sfDir> [n]
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
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
    val in = java.nio.file.Files.createTempDirectory("graft_ps_").toString + "/in"
    // one input file = one task for the pre-shuffle signature stage; a
    // real stream source has many files/partitions, so mirror that
    docs.repartition(spark.sparkContext.defaultParallelism).write.parquet(in)
    val schema = spark.read.parquet(in).schema
    for (i <- 0 until n) {
      val s = spark.readStream.schema(schema).parquet(in)
        .withColumn("ts", timestamp_seconds(lit(1735689600L) + col("doc_id")))
      val t0 = System.nanoTime()
      val q = graft.streaming.Streams.minhashCandidates(s)
        .toDF().writeStream.format("memory").queryName(s"ps_$i")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = spark.sql(s"select count(*) from ps_$i").collect()(0).getLong(0)
      println(f"[ps] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $rows pairs")
    }
    spark.stop()
  }
}
