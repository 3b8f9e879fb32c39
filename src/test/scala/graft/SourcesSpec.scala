package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextSources
import graft.store.TableStore

/** Pins the text-ingestion surface (SURVEY C32/C33): CSV and JSON Lines
  * round-trips including the corners the formats are notorious for —
  * embedded delimiters/quotes, nulls, micro-precision timestamps, and
  * JSON's field-omission convention. */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String) =
    s"${sys.props("java.io.tmpdir")}/graft_sources_spec/${tag}_${System.nanoTime()}"

  test("CSV round-trips embedded delimiters, quotes and nulls") {
    val df = Seq(
      (1L, Some("""plain"""), Some(10)),
      (2L, Some("""has,comma"""), None),
      (3L, Some("""has "quotes" inside"""), Some(-3)),
      (4L, None, Some(255))).toDF("id", "s", "n")
    val dir = tmp("csv_quote")
    TextSources.writeCsv(df, dir)
    val back = TextSources.readCsv(spark, dir)
    assert(back.orderBy("id").collect().toSeq == Seq(
      Row(1, "plain", 10), Row(2, "has,comma", null),
      Row(3, """has "quotes" inside""", -3), Row(4, null, 255)))
  }

  test("CSV explicit schema skips inference and pins the declared types") {
    val df = Seq((1L, "a", 1.5)).toDF("id", "s", "x")
    val dir = tmp("csv_schema")
    TextSources.writeCsv(df, dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("x", DoubleType)))
    val back = TextSources.readCsv(spark, dir, schema = Some(schema))
    assert(back.schema == schema)
    assert(back.collect().toSeq == Seq(Row(1L, "a", 1.5)))
  }

  test("JSONL round-trips micro-precision timestamps and omitted nulls") {
    val ts = Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val df = Seq(
      (1L, Some(ts), Some("""{"k":1}""")),
      (2L, None, None)).toDF("id", "ts", "payload")
    val dir = tmp("jsonl_ts")
    TextSources.writeJsonl(df, dir)
    val back = TextSources.readJsonl(spark, dir)
    assert(back.schema("ts").dataType == TimestampType,
      "ISO timestamps must infer as TimestampType, not string")
    val rows = back.select("id", "ts", "payload").orderBy("id").collect()
    assert(rows(0) == Row(1L, ts, """{"k":1}"""))
    assert(rows(1) == Row(2L, null, null))
  }

  test("JSONL keeps a JSON-encoded string payload as text, not a struct") {
    val df = Seq((1L, """{"nested":{"deep":true}}""")).toDF("id", "payload")
    val dir = tmp("jsonl_str")
    TextSources.writeJsonl(df, dir)
    val back = TextSources.readJsonl(spark, dir)
    assert(back.schema("payload").dataType == StringType)
    assert(back.select("payload").first().getString(0) == """{"nested":{"deep":true}}""")
  }

  test("streaming CSV source drains a directory batch by batch") {
    import org.apache.spark.sql.streaming.Trigger
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val dir = tmp("csv_stream")
    TextSources.writeCsv(df, dir)
    val schema = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))
    val q = TextSources.readCsvStream(spark, dir, schema, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("csv_stream_t")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("csv_stream_t").orderBy("id").collect().toSeq ==
      Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
  }

  test("ingestCsv creates a narrowed, PK'd store table") {
    val df = Seq((1L, 200L, "aa"), (2L, 90000L, "b")).toDF("k", "v", "s")
    val dir = tmp("csv_ingest")
    TextSources.writeCsv(df, dir)
    val store = new TableStore(spark,
      s"${sys.props("java.io.tmpdir")}/graft_sources_spec/store_${System.nanoTime()}")
    TextSources.ingestCsv(store, "t", dir, primaryKey = Seq("k"))
    val types = store.describe("t").select("column_name", "sql_type")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // smallest-type narrowing ran over the CSV-read frame
    assert(types("k") == "tinyint" && types("v") == "int" && types("s") == "varchar(2)")
    assert(store.readTable("t", orderBy = Seq("k"))
      .selectExpr("cast(k as int) k", "cast(v as int) v", "s").collect().toSeq ==
      Seq(Row(1, 200, "aa"), Row(2, 90000, "b")))
    // the PK registered: a duplicate insert surfaces via the C5 check
    store.insert("t", Seq((1L, 5L, "x")).toDF("k", "v", "s"))
    assert(store.primaryKeyViolations("t").count() > 0)
  }

  test("C39 mirror sync: rewrites only changed partitions, prunes fully-deleted ones, file-identity elsewhere") {
    import org.apache.spark.sql.functions._
    import graft.sources.ParquetLayout
    import graft.store.TableStore
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_c39_").toString)
    store.createTable("t",
      Seq("k" -> "bigint", "grp" -> "varchar(8)", "v" -> "bigint"), Seq("k"))
    store.insert("t", Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "grp", "v"))
    val mirror = tmp("mirror")
    ParquetLayout.exportPartitioned(store.readTable("t"), mirror, Seq("grp"))
    val gen0 = store.snapshots("t").map(_._1).max
    def files(grp: String): Set[(String, Long)] = {
      val d = new java.io.File(s"$mirror/grp=$grp")
      if (!d.isDirectory) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val dBefore = files("d")
    assert(dBefore.nonEmpty)
    // mutate: update a, insert into b, delete ALL of c; d untouched
    store.update("t", Seq((1L, "a", 11L)).toDF("k", "grp", "v"))
    store.insert("t", Seq((5L, "b", 50L)).toDF("k", "grp", "v"))
    store.delete("t", Seq(Tuple1(3L)).toDF("k"), Seq("k"))
    val gen1 = store.snapshots("t").map(_._1).max
    val touched = ParquetLayout.syncMirror(store, "t", mirror, "grp", gen0, gen1)
    assert(touched == Seq("a", "b", "c"))
    // the mirror serves the table's exact current content
    val got = spark.read.parquet(mirror)
      .select(col("k").cast("long"), col("grp"), col("v").cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "a", 11L), (2L, "b", 20L), (5L, "b", 50L), (4L, "d", 40L)))
    // untouched partition keeps its exact files; deleted one is gone
    assert(files("d") == dBefore, "sync rewrote an untouched partition")
    assert(files("c").isEmpty && !new java.io.File(s"$mirror/grp=c").exists())
  }

  test("C39 guards: partition-collect cap is a named error; escaped and NULL partition values sync correctly") {
    import org.apache.spark.sql.functions._
    import graft.sources.ParquetLayout
    import graft.store.TableStore
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_c39g_").toString)
    store.createTable("t",
      Seq("k" -> "bigint", "grp" -> "varchar(8)", "v" -> "bigint"), Seq("k"))
    // 'x:y' needs Hive path escaping (grp=x%3Ay); null lands in
    // __HIVE_DEFAULT_PARTITION__ — both classes the r7 ADVICE flagged
    // as silently mishandled by the hand-built `$col=$v` path
    store.insert("t", Seq((1L, Some("x:y"), 1L), (2L, None, 2L), (3L, Some("ok"), 3L))
      .toDF("k", "grp", "v"))
    val mirror = tmp("mirror_guard")
    ParquetLayout.exportPartitioned(store.readTable("t"), mirror, Seq("grp"))
    val escDir = new java.io.File(s"$mirror/grp=x%3Ay")
    val nullDir = new java.io.File(s"$mirror/grp=__HIVE_DEFAULT_PARTITION__")
    assert(escDir.isDirectory, "export must escape ':' exactly as Spark's writer does")
    assert(nullDir.isDirectory, "export must land NULL in the Hive default partition")
    val gen0 = store.snapshots("t").map(_._1).max
    // delete BOTH awkward partitions entirely, update the plain one
    store.delete("t", Seq(Tuple1(1L), Tuple1(2L)).toDF("k"), Seq("k"))
    store.update("t", Seq((3L, "ok", 33L)).toDF("k", "grp", "v"))
    val gen1 = store.snapshots("t").map(_._1).max
    // the cap: 3 touched partition values over a limit of 1 must be the
    // NAMED error, thrown before any driver-side accumulation
    intercept[graft.errors.TooManyPartitions] {
      ParquetLayout.syncMirror(store, "t", mirror, "grp", gen0, gen1, maxPartitions = 1)
    }
    val touched = ParquetLayout.syncMirror(store, "t", mirror, "grp", gen0, gen1)
    assert(touched == Seq("ok", "x:y", "__HIVE_DEFAULT_PARTITION__"))
    // fully-deleted escaped + null partitions are pruned via the
    // FileSystem API against the writer's own directory names
    assert(!escDir.exists(), "stale escaped partition directory must be deleted")
    assert(!nullDir.exists(), "stale null partition directory must be deleted")
    val got = spark.read.parquet(mirror)
      .select(col("k").cast("long"), col("v").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 33L)))
  }

  test("C36 partitioned export: lossless round-trip, and a partition filter reads ONLY the matching directory") {
    import org.apache.spark.sql.functions._
    import graft.sources.ParquetLayout
    val ev = GraftSession.table(spark, SparkTestSession.sfDir, "events")
    val path = tmp("part")
    ParquetLayout.exportPartitioned(ev, path, Seq("event_type"))
    // one directory per partition value, no small-file spray: the
    // pre-write repartition means ≤ a handful of files per directory
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    val nTypes = ev.select("event_type").distinct().count().toInt
    assert(dirs.length == nTypes)
    dirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files <= 4, s"${d.getName}: $files files — small-file spray")
    }
    // round-trip loses nothing (column order differs: partition col last)
    val back = ParquetLayout.readPartitioned(spark, path)
    val cols = ev.columns.toSeq
    assert(back.columns.toSet == cols.toSet)
    val a = ev.select(cols.map(col): _*).orderBy("event_id").collect().toSeq
    val b = back.select(cols.map(col): _*).orderBy("event_id").collect().toSeq
    assert(a == b)
    // directory-level pruning: the partition predicate lands in the
    // scan's PartitionFilters (plan-time directory pruning), not in the
    // data filters, and the filtered count matches the source relation
    val filtered = back.filter(col("event_type") === "click")
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scanLine = plan.split("\n").find(_.contains("PartitionFilters"))
      .getOrElse(fail("no PartitionFilters in the scan"))
    assert(scanLine.contains("event_type"),
      s"partition predicate not pushed to directory pruning: $scanLine")
    assert(filtered.count() ==
      ev.filter(col("event_type") === "click").count())
  }
}
