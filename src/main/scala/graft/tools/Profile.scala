package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time one query (and its stages) at a given SF dir.
  * Usage: runMain graft.tools.Profile <sfDir> <name> [n]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 0 until n) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $cnt rows")
    }
    spark.stop()
  }
}
