package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deliverable aid (r16): dump the EXECUTED physical plans of store
  * mutations and maintenance folds — the plans that changed this round
  * live inside lifecycle side effects, which [[PlanDump]] (final read
  * frames only) cannot show. Captures every successful query execution
  * inside a scenario via a QueryExecutionListener and writes the
  * AQE-final plan trees to `<outDir>/<scenario>.txt`. Never run by the
  * driver.
  *
  * Usage: runMain graft.MutationPlanDump <outDir>
  */
object MutationPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    new java.io.File(outDir).mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val plans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        plans.add(qe.executedPlan.toString); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })

    def scenario(name: String)(body: => Unit): Unit = {
      plans.clear()
      body
      org.apache.spark.sql.graftx.bridge.drainListenerBus(spark.sparkContext, 10000)
      import scala.jdk.CollectionConverters._
      val txt = plans.asScala.zipWithIndex
        .map { case (p, i) => s"== query $i ==\n$p" }.mkString("\n\n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"), txt.getBytes("UTF-8"))
      println(s"[mutplandump] $name: ${plans.size()} plans")
    }

    def newStore() = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_mpd_").toString)

    // keyed upsert on a bucketed table — the wave-4 shape (table side
    // of the full-outer mutation join)
    scenario("upsert_bucketed_mutation") {
      val store = newStore()
      store.createTable("t", Seq("k" -> "bigint", "v" -> "bigint"), Seq("k"), buckets = sys.env.getOrElse("MPD_BUCKETS", "8").toInt)
      store.insert("t", spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS v"))
      plans.clear() // setup plans are noise; keep only the mutation's
      store.upsert("t", spark.range(0, 64).selectExpr("id AS k", "id * 3 AS v"))
    }

    // one min/max maintenance fold (delete included → rescan leg) —
    // the wave-2 shape
    scenario("summary_minmax_fold") {
      val store = newStore()
      val base = spark.range(0, 3000).select(
        (col("id") % 7).cast("string").as("g"), col("id").cast("long").as("v"))
      store.createTableFromDataFrame("base", base, Seq("v"), infer = false)
      store.createTableFromDataFrame("summary",
        graft.store.IncrementalAgg.summarizeMinMax(store.readTable("base"), Seq("g"), "v"),
        Seq("g"), infer = false)
      graft.store.IncrementalAgg.markMaintained(
        store, "base", "summary", store.snapshots("base").last._1)
      store.upsert("base", Seq(("3", 9999L), ("5", 10000L)).toDF("g", "v"))
      store.delete("base", Seq(Tuple1(2999L)).toDF("v"))
      plans.clear()
      graft.store.IncrementalAgg.maintainMinMaxToCurrent(store, "base", "summary", Seq("g"), "v")
    }

    spark.stop()
  }
}
