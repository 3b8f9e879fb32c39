package graft

import org.apache.spark.sql.SparkSession

/** Deliverable aid: dump `.explain("formatted")` for declared queries
  * to `<outDir>/<name>.txt` (plans/r15 evidence). Builds each query's
  * DataFrame exactly as Bench/Verify do (lifecycle side effects run),
  * then prints the FORMATTED plan of the returned frame without
  * executing it. Never run by the driver.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.PlanDump <outDir> [names…]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.store.NioLocalFileSystem.ConfKey,
        graft.store.NioLocalFileSystem.ConfValue)
      .config(graft.store.NioLocalFileSystem.AbstractConfKey,
        graft.store.NioLocalFileSystem.AbstractConfValue)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$n.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] $n ok")
      } catch {
        case e: Throwable => println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
      Graft.clearOperatorCaches(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
