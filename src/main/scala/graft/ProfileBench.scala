package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Measurement aid (guide §1): run selected bench entries with a
  * per-job listener that attributes Spark-job wall time to the call
  * site that launched it, and reports the driver-side remainder
  * (wall − Σ job time = planning, filesystem metadata, manifest
  * commits). Same session shape as [[Bench]]. Never run by the driver.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.ProfileBench q1_pricing_summary …"
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    // mirror Bench's setup accounting so the profile reports the same
    // signal/setup split the graded bench does (r16; bootstraps still
    // run for real — only their span is attributed separately)
    BenchSetup.armed = true

    final case class J(id: Int, t0: Long, t1: Long, site: String, tasks: Int)
    val jobs = mutable.ArrayBuffer[J]()
    val starts = mutable.Map[Int, (Long, String, Int)]()
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(s.executionId, s.description); ()
          case _ =>
        }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val p = Option(j.properties)
        val site = p.flatMap(pp => Option(pp.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(execDesc.get(id.toLong)))
          .orElse(p.flatMap(pp => Option(pp.getProperty("callSite.short"))))
          .getOrElse("?")
        val tasks = j.stageInfos.map(_.numTasks).sum
        starts.synchronized { starts(j.jobId) = (System.nanoTime(), site, tasks); () }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = starts.synchronized {
        starts.remove(j.jobId).foreach { case (t0, site, tasks) =>
          jobs += J(j.jobId, t0, System.nanoTime(), site, tasks)
        }
        ()
      }
    })

    val warmDir = "/root/testdata/sf0.001"
    args.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'"))
      if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
        try fn(spark, warmDir).count() catch { case _: Throwable => }
        Graft.clearOperatorCaches(); spark.catalog.clearCache()
      }
      jobs.synchronized { jobs.clear() }
      BenchSetup.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val setup = BenchSetup.drained() / 1e9
      org.apache.spark.sql.graftx.bridge.drainListenerBus(spark.sparkContext, 10000)
      val snap = jobs.synchronized { jobs.toVector.sortBy(_.t0) }
      val jobSum = snap.map(j => (j.t1 - j.t0) / 1e9).sum
      println(f"== $n  wall=$wall%.3f s  signal=${wall - setup}%.3f s  setup=$setup%.3f s  jobs=${snap.size}  jobTime=$jobSum%.3f s  driverGap=${wall - jobSum}%.3f s")
      snap.groupBy(_.site).toSeq
        .map { case (s, js) => (s, js.size, js.map(j => (j.t1 - j.t0) / 1e9).sum) }
        .sortBy(-_._3)
        .take(30)
        .foreach { case (s, cnt, tot) => println(f"   $tot%8.3f s  n=$cnt%-4d $s") }
      // timeline: per job — start offset, duration, task count, gap since
      // the previous job's end (driver-side planning/filesystem time)
      if (sys.env.contains("GRAFT_PROF_TIMELINE")) {
        var prevEnd = t0
        snap.foreach { j =>
          val gap = (j.t0 - prevEnd) / 1e9
          println(f"   job ${j.id}%4d  +${(j.t0 - t0) / 1e9}%7.3f  dur=${(j.t1 - j.t0) / 1e9}%7.3f  tasks=${j.tasks}%-4d gap=$gap%7.3f  ${j.site.take(90)}")
          prevEnd = math.max(prevEnd, j.t1)
        }
      }
      Graft.clearOperatorCaches(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
