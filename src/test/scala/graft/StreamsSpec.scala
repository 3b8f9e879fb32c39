package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Streaming operators driven with Trigger.AvailableNow over parquet
  * input and asserted equal to their batch twins (SURVEY §2 S1–S3). */
class StreamsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}
  import spark.implicits._

  private lazy val inputDir: String = {
    val dir = Files.createTempDirectory("graft_stream_").toString + "/events"
    GraftSession.table(spark, sfDir, "events").write.parquet(dir)
    dir
  }

  private def stream: DataFrame = {
    val schema = spark.read.parquet(inputDir).schema
    spark.readStream.schema(schema).parquet(inputDir)
  }

  private def runToTable(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("S1: streaming tumbling window agg equals the batch twin") {
    val got = runToTable(Streams.windowedCounts(stream), "s1", "complete")
      .orderBy("window_start", "event_type").collect()
    val want = GraftSession.table(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(18,4)").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("S1b: streaming hopping windows equal the batch twin") {
    val got = runToTable(Streams.hoppingCounts(stream), "s1b", "complete")
      .orderBy("window_start", "event_type").collect()
    val want = GraftSession.table(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("decimal(18,4)").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type").collect()
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("S2: streaming dedup by key emits each key once") {
    val got = runToTable(Streams.dedupeByKey(stream, "event_id"), "s2", "append")
    val total = spark.read.parquet(inputDir).count()
    assert(got.count() == spark.read.parquet(inputDir).select("event_id").distinct().count())
    assert(got.count() <= total)
  }

  test("S4: stream-stream interval join equals the batch join") {
    val got = runToTable(Streams.clickToPurchase(stream), "s4", "append")
      .orderBy("purchase_id", "click_id").collect()
    val e = GraftSession.table(spark, sfDir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val want = purchases.join(clicks,
      expr("c_user = user_id AND click_ts <= purchase_ts AND click_ts >= purchase_ts - INTERVAL 30 MINUTES"))
      .select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")
      .orderBy("purchase_id", "click_id").collect()
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("S5: streaming content dedup suppresses duplicate payloads") {
    // events with duplicated props payloads: stream unioned with itself
    val dup = stream.select(col("event_id"), col("ts"), col("props"))
      .unionByName(stream.select(col("event_id"), col("ts"), col("props")))
    val got = runToTable(Streams.dedupeByContent(dup, "props", "ts"), "s5", "append")
    val distinctPayloads = spark.read.parquet(inputDir).select("props").distinct().count()
    assert(got.count() == distinctPayloads)
  }

  test("S31: paragraph admission admits each distinct paragraph once; set equals the batch segmentation") {
    val docs = GraftSession.table(spark, sfDir, "documents")
    val in = Files.createTempDirectory("graft_s31_").toString + "/in"
    // two files so duplicated paragraphs straddle micro-batches; the
    // second file REPLAYS half the corpus — pure duplicate content
    docs.coalesce(1).write.mode("append").parquet(in)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
      .withColumn("ts", timestamp_seconds(lit(1735689600L) + col("doc_id")))
    val got = runToTable(Streams.paragraphAdmission(s), "s31", "append")
      .select("para_text").collect().map(_.getString(0)).toSeq
    // every paragraph admitted EXACTLY once...
    assert(got.size == got.distinct.size, "a duplicate paragraph was admitted twice")
    // ...and the admitted set is the batch segmentation's distinct
    // paragraph contents (in-memory twin of L60's 20-token windows)
    val want = docs.select("text").collect().map(_.getString(0)).flatMap { t =>
      t.split(" ", -1).grouped(20).map(_.mkString(" "))
    }.toSet
    assert(got.toSet == want)
  }

  test("S6: streaming minhash detects the known near-dup pairs across micro-batches") {
    import graft.dedup.Dedup
    val docs = GraftSession.table(spark, sfDir, "documents")
    val in = Files.createTempDirectory("graft_s6_").toString + "/in"
    // split by parity so most near-dup pairs straddle the two batches
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(in)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    // documents have no event time; synthesize one (seconds by doc_id) —
    // the whole corpus lands inside the default state horizon
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
      .withColumn("ts", timestamp_seconds(lit(1735689600L) + col("doc_id")))
    val got = runToTable(Streams.minhashCandidates(s).toDF(), "s6", "append")
      .select("a_id", "b_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = Dedup.ngramJaccardPairs(docs, tau = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.nonEmpty)
    assert(strong.subsetOf(got),
      s"streaming minhash missed strong pairs: ${strong -- got}")
    // precision guard: candidates must be a short list, not a flood
    // (token-level signatures once produced thousands of false pairs)
    assert(got.size <= strong.size * 5,
      s"candidate flood: ${got.size} pairs for ${strong.size} strong ones")
  }

  test("S24: streaming classifier gate equals batch scoring and ignores the batch split") {
    import graft.operators.Curation
    val docs = GraftSession.table(spark, sfDir, "documents")
    val weights = Curation.trainClassifier(docs, col("lang") === "en",
        nBuckets = 64, iters = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val wVec = (0 to 64).map(b => weights.getOrElse(b, 0L))
    val in = Files.createTempDirectory("graft_s24_").toString + "/in"
    docs.repartition(4).write.parquet(in)
    val schema = spark.read.parquet(in).schema
    def gated(maxFiles: Int, name: String) = {
      val s = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", maxFiles).parquet(in)
      runToTable(Streams.classifierGate(s, wVec, thresholdMicros = 0L),
          name, "append")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    }
    val got = gated(1, "s24a")
    // batch twin through the SAME serving expression
    val want = docs.select(col("doc_id"),
        Curation.linearScoreMicros(wVec).as("score_micros"))
      .withColumn("accept", col("score_micros") >= 0L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == want)
    // scores are a real signal, not a constant
    assert(got.map(_._2).distinct.size > 1)
    // stateless: a different micro-batch split emits identical rows
    assert(gated(4, "s24b") == got)
    Graft.clearOperatorCaches()
  }

  test("S28: streaming running trend equals the batch OLS over each type's closed days") {
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Double)]()
    val q = Streams.trendMonitorSink(stream, df =>
      got.synchronized { got ++= df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))) })
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(got.nonEmpty, "no windows closed under the watermark")
    // last emission per type carries the full folded state
    val last = got.groupBy(_._1).map { case (ty, es) => ty -> es.last }
    // expected: exact OLS over the type's n_days EARLIEST days (the
    // watermark closes windows in event-time order)
    val ev = GraftSession.table(spark, sfDir, "events")
    val daily = ev.groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("x"))
      .agg(sum((col("value").cast("decimal(18,4)") * 10000).cast("long")).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    last.foreach { case (ty, (_, nDays, slope)) =>
      val days = daily(ty).sortBy(_._2).take(nDays.toInt)
      assert(days.length == nDays.toInt, s"$ty: closed more days than exist")
      val n = days.length.toLong
      val (sx, sy) = (days.map(_._2).sum, days.map(_._3).sum)
      val sxy = days.map(d => d._2 * d._3).sum
      val sxx = days.map(d => d._2 * d._2).sum
      val exp = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble / 10000.0
      assert(slope == exp, s"$ty: streaming slope $slope != batch $exp over $n closed days")
    }
    // every type with ≥2 closed days reports a finite slope
    assert(last.values.exists(v => v._2 >= 2 && !v._3.isNaN))
  }

  test("S27: streaming media monitor equals batch decode stats; corrupt objects surface as unknown") {
    import graft.multimodal.Media
    val docs = GraftSession.table(spark, sfDir, "documents")
    val media = Media.syntheticMediaTable(docs)
    val in = Files.createTempDirectory("graft_s27_").toString + "/in"
    media.write.parquet(in)
    // far-future sentinel closes the corpus window (corrupt on purpose:
    // 1-byte payload → 'unknown'; excluded from the comparison window)
    media.limit(1).withColumn("doc_id", lit(999999L))
      .withColumn("media", lit(Array[Byte](9)))
      .coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
      .withColumn("ts", timestamp_seconds(
        when(col("doc_id") === 999999L, lit(1735689600L + 86400L))
          .otherwise(lit(1735689600L) + pmod(col("doc_id"), lit(300L)))))
    val got = runToTable(Streams.mediaIngestMonitor(s), "s27", "append")
      .filter(col("window_start") < lit("2025-01-02").cast("timestamp"))
      .groupBy("format")
      .agg(sum("n_files").as("n_files"), sum("n_px").as("n_px"))
      .orderBy("format").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Media.decodeTable(media)
      .groupBy("format")
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("width") > 0, col("width") * col("height")).otherwise(0L)).as("n_px"))
      .orderBy("format").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // the corrupt class is present and visible (doc_id % 10 == 0 docs)
    assert(got.exists(g => g._1 == "unknown" && g._2 > 0))
    assert(got.map(_._1).toSet == Set("png", "jpeg", "bmp", "unknown"))
  }

  test("S26: streaming sketch buckets equal the batch histogram per closed window; merged quantiles agree") {
    import graft.operators.Analytics
    val got = runToTable(Streams.quantileSketchStream(stream), "s26", "append")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty, "no windows closed under the watermark")
    val ev = GraftSession.table(spark, sfDir, "events")
    val want = Analytics.valueSketch(
        ev.withColumn("day", date_trunc("day", col("ts"))),
        Seq("event_type", "day")).collect()
      .map(r => ((r.getString(0), r.getTimestamp(1), r.getLong(2)), (r.getLong(3), r.getLong(4))))
      .toMap
    // every emitted bucket row is counter-identical to the batch
    // histogram of the same (type, day) cell
    got.foreach { case (ty, day, bin, up, cnt) =>
      assert(want((ty, day, bin)) == ((up, cnt)),
        s"bucket ($ty, $day, $bin) diverged from the batch sketch")
    }
    // closure accounting (the S23 contract): all but each type's last
    // two open days must have emitted
    val emittedCells = got.map(t => (t._1, t._2)).distinct.length
    val allCells = want.keySet.map(k => (k._1, k._2)).size
    val nTypes = ev.select("event_type").distinct().count().toInt
    assert(emittedCells >= allCells - 2 * nTypes)
    // the emitted rows ARE the sketch: merging them up to type answers
    // the same quantiles as the batch sketch over the same events
    val emitted = got.toSeq
      .toDF("event_type", "window_start", "bin_id", "bin_upper", "cnt")
    val mergedQ = Analytics.sketchQuantiles(emitted, Seq("event_type"))
      .orderBy("event_type").collect().toSeq
    val dayKeys = got.map { case (t, d, _, _, _) => s"$t|${d.getTime}" }.distinct
    val subset = ev.withColumn("day", date_trunc("day", col("ts")))
      .filter(concat_ws("|", col("event_type"),
        expr("unix_millis(day)").cast("string")).isInCollection(dayKeys))
    val batchQ = Analytics.sketchQuantiles(
        Analytics.valueSketch(subset, Seq("event_type")), Seq("event_type"))
      .orderBy("event_type").collect().toSeq
    assert(mergedQ == batchQ)
  }

  test("S30: streamed HLL window sketches merge to the batch estimate exactly") {
    import graft.operators.Analytics
    val got = runToTable(Streams.hllMaintenanceStream(stream), "s30", "append")
    val cells = got.select(col("event_type"), col("window_start")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
    assert(cells.nonEmpty, "no windows closed under the watermark")
    // merging the emitted per-day sketch payloads up to type equals the
    // batch sketch path over the SAME closed (type, day) cells — the
    // A45 register-equality contract surviving the stream boundary
    val streamedEst = Analytics.sketchEstimate(got, Seq("event_type"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val dayKeys = cells.map { case (t, d) => s"$t|${d.getTime}" }.distinct.toSeq
    val ev = GraftSession.table(spark, sfDir, "events")
    val subset = ev.withColumn("day", date_trunc("day", col("ts")))
      .filter(concat_ws("|", col("event_type"),
        expr("unix_millis(day)").cast("string")).isInCollection(dayKeys))
    val batchEst = Analytics.sketchEstimate(
        Analytics.distinctSketches(subset, Seq("event_type", "day"), "user_id"),
        Seq("event_type"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamedEst == batchEst,
      "streamed sketches must merge to the batch estimate exactly")
    assert(streamedEst.forall(_._2 > 0))
  }

  test("S29: streaming CMS maintenance is counter-identical to the batch sketch; estimates agree") {
    import graft.operators.Curation
    val docs = GraftSession.table(spark, sfDir, "documents")
    val in = Files.createTempDirectory("graft_s29_").toString + "/in"
    docs.write.parquet(in)
    // far-future sentinel (second file → second micro-batch) closes the
    // corpus window under the watermark; its own window is filtered out
    docs.limit(1).withColumn("doc_id", lit(999999L)).withColumn("lang", lit("zz"))
      .coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
      .withColumn("ts", timestamp_seconds(
        when(col("lang") === "zz", lit(1735689600L + 86400L * 2))
          .otherwise(lit(1735689600L) + pmod(col("doc_id"), lit(300L)))))
    val corpusWindow = new java.sql.Timestamp(1735689600L * 1000L)
    val got = runToTable(Streams.cmsMaintenanceStream(s), "s29", "append")
      .filter(col("window_start") === lit(corpusWindow))
      .select("r", "b", "n").collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val want = Curation.countMinSketch(docs).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.nonEmpty && got == want,
      "streamed CMS counters must be identical to the batch sketch")
    // the streamed rows serve estimates exactly as the batch sketch does
    val probes = docs.select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").count().orderBy(col("count").desc, col("term")).limit(5)
      .select("term")
    val streamedSketch = got.toSeq.map { case ((r, b), n) => (r, b, n) }
      .toDF("r", "b", "n")
    val estStream = Curation.cmsEstimate(streamedSketch, probes)
      .orderBy("term").collect().toSeq
    val estBatch = Curation.cmsEstimate(Curation.countMinSketch(docs), probes)
      .orderBy("term").collect().toSeq
    assert(estStream == estBatch)
  }

  test("S25: streaming vocab-drift monitor equals the batch coverage audit per closed window") {
    import graft.operators.Curation
    val docs = GraftSession.table(spark, sfDir, "documents")
    val vocab = Curation.topVocabulary(docs, 20).cache()
    val in = Files.createTempDirectory("graft_s25_").toString + "/in"
    docs.write.parquet(in)
    // far-future sentinel (second file → second micro-batch) closes the
    // corpus window under the watermark; filtered back out of the result
    docs.limit(1).withColumn("doc_id", lit(999999L)).withColumn("lang", lit("zz"))
      .coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
      .withColumn("ts", timestamp_seconds(
        when(col("lang") === "zz", lit(1735689600L + 86400L))
          .otherwise(lit(1735689600L) + pmod(col("doc_id"), lit(300L)))))
    val got = runToTable(Streams.vocabDriftMonitor(s, vocab), "s25", "append")
      .filter(col("lang") =!= "zz")
      .groupBy("lang")
      .agg(sum("n_tokens").as("n_tokens"), sum("oov_tokens").as("oov_tokens"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Curation.vocabCoverage(docs, 20)
      .select("lang", "n_tokens", "oov_tokens").orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.map(_._3).sum > 0, "no OOV tokens — the audit is vacuous")
    vocab.unpersist(); Graft.clearOperatorCaches()
  }

  test("S8: streaming contamination gate equals the batch operator") {
    import graft.dedup.Contamination
    val docs = GraftSession.table(spark, sfDir, "documents")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val in = Files.createTempDirectory("graft_s8_").toString + "/in"
    eval.write.parquet(in)
    // append mode only emits a window once the watermark passes its end:
    // a far-future sentinel doc (second file, second micro-batch)
    // advances the watermark so the eval windows finalize
    eval.limit(1).withColumn("doc_id", lit(999999L))
      .coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
      .withColumn("ts", timestamp_seconds(
        when(col("doc_id") === 999999L, lit(1735689600L + 86400L))
          .otherwise(lit(1735689600L) + col("doc_id"))))
    val trainSh = Contamination.trainShingleSet(train).cache()
    val got = runToTable(Streams.contaminationGate(s, trainSh), "s8", "append")
      .filter(col("doc_id") =!= 999999L)
      .orderBy("doc_id").collect().toSeq
    val want = Contamination.overlap(train, eval).orderBy("doc_id").collect().toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("S10: streaming centroid drift equals batch centroids; missing reference label flags") {
    import graft.similarity.Ann
    val emb = GraftSession.table(spark, sfDir, "embeddings")
    val in = Files.createTempDirectory("graft_s10_").toString + "/in"
    emb.write.parquet(in)
    // far-future sentinel (second micro-batch) pushes the watermark so
    // the main window finalizes in append mode (as in the S8 spec)
    emb.limit(1).withColumn("vec_id", lit(999999L))
      .coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
      .withColumn("ts", timestamp_seconds(
        when(col("vec_id") === 999999L, lit(1735689600L + 86400L))
          .otherwise(lit(1735689600L) + col("vec_id") % 600)))
    // reference omits label 9 → that label must flag as drifted
    val reference = Ann.labelCentroids(emb).filter(col("label") =!= 9).cache()
    val got = runToTable(Streams.centroidDrift(s, reference), "s10", "append")
      .filter(col("window_start") === timestamp_seconds(lit(1735689600L)))
      .orderBy("label").collect()
    // the stream IS the reference corpus, so every referenced label's
    // window centroid matches its reference centroid exactly
    val want = Ann.labelCentroids(emb).orderBy("label", "pos")
      .collect().groupBy(_.getInt(0)).view
      .mapValues(rs => (rs.head.getLong(2), rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq))
      .toMap
    assert(got.map(_.getInt(1)).toSeq == (0 to 9))
    got.foreach { r =>
      val label = r.getInt(1)
      assert((r.getLong(2), r.getSeq[Double](3).toSeq) == want(label),
        s"label $label centroid diverged from the batch twin")
      if (label == 9) assert(r.isNullAt(4) && r.getBoolean(5), "unreferenced label must flag")
      else assert(r.getDouble(4) == 1.0 && !r.getBoolean(5), s"label $label drifted vs itself")
    }
  }

  test("S9: streaming quota holds the per-(group, window) cap across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    def at(offsetSec: Long) = new java.sql.Timestamp(base.getTime + offsetSec * 1000)
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val in = ms.toDF().toDF("doc_id", "lang", "ts")
    val q = Streams.streamingQuota(in, "lang", "doc_id", cap = 2,
        windowDuration = "10 minutes")
      .toDF().writeStream.format("memory").queryName("s9").outputMode("append").start()
    try {
      // batch 1: three 'en' docs in window [00:00,00:10) → only 2 admitted
      ms.addData((1L, "en", at(10)), (2L, "en", at(20)), (3L, "en", at(30)))
      q.processAllAvailable()
      // batch 2: two more 'en' docs, SAME window → 0 admitted (state
      // carries the count); one 'de' doc → its own quota admits it;
      // one 'en' doc in the NEXT window → fresh counter admits it
      ms.addData((4L, "en", at(40)), (5L, "en", at(50)),
        (6L, "de", at(40)), (7L, "en", at(700)))
      q.processAllAvailable()
      val got = spark.table("s9")
        .select("doc_id", "group", "admit_seq").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val enFirstWindow = got.filter(p => p._2 == "en" && p._1 <= 5)
      assert(enFirstWindow.size == 2, s"cap violated across batches: $got")
      // deterministic admission: batch-1 'en' rows admitted by md5(id)
      // order — md5("1") < md5("2") < md5("3") → ids 1 and 2
      assert(enFirstWindow.map(_._1) == Set(1L, 2L), s"non-hash-order admission: $got")
      assert(got.contains((6L, "de", 1)), s"independent group quota missing: $got")
      assert(got.contains((7L, "en", 1)), s"next-window quota missing: $got")
    } finally q.stop()
  }

  test("S32: streaming budget holds across micro-batches, skips oversized docs, never overspends") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    def at(offsetSec: Long) = new java.sql.Timestamp(base.getTime + offsetSec * 1000)
    val ms = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val in = ms.toDF().toDF("doc_id", "source", "text", "ts")
    val q = Streams.streamingBudget(in, "source", "doc_id", budgetTokens = 5,
        windowDuration = "10 minutes")
      .toDF().writeStream.format("memory").queryName("s32").outputMode("append").start()
    try {
      // budget = 5 tokens per (source, 10-min window). Batch 1, all one
      // window, admission order = md5(id): doc1 (2 tok, used 2), doc2
      // (2 tok, used 4), doc3 (3 tok — 4+3 > 5, skipped)
      ms.addData((1L, "en", "a b", at(10)), (2L, "en", "a b", at(20)),
        (3L, "en", "a b c", at(30)))
      q.processAllAvailable()
      // batch 2: state carries used=4 — doc4 (1 tok) fits exactly
      // (used 5), doc5 (1 tok) rejected (5+1 > 5). 'de' group: doc6
      // (6 tok > budget) can NEVER fit and is SKIPPED — doc8 (1 tok,
      // later in md5 order) must still be admitted: the gate skips,
      // it does not close the window (the batch prefix-stop is a
      // selection semantic, not an admission one). doc7 opens the NEXT
      // 'en' window with a fresh budget.
      ms.addData((4L, "en", "a", at(40)), (5L, "en", "a", at(50)),
        (6L, "de", "a b c d e f", at(40)), (8L, "de", "a", at(50)),
        (7L, "en", "a", at(700)))
      q.processAllAvailable()
      val got = spark.table("s32")
        .select("doc_id", "group", "n_tokens", "budget_used").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == Set(
        (1L, "en", 2L, 2L), (2L, "en", 2L, 4L), (4L, "en", 1L, 5L),
        (8L, "de", 1L, 1L), (7L, "en", 1L, 1L)), s"admissions: $got")
    } finally q.stop()
  }

  test("S32/S9: a late row for a watermark-evicted window is dropped, not readmitted with a fresh budget") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    def at(offsetSec: Long) = new java.sql.Timestamp(base.getTime + offsetSec * 1000)
    val ms = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val in = ms.toDF().toDF("doc_id", "source", "text", "ts")
    val q = Streams.streamingBudget(in, "source", "doc_id", budgetTokens = 3,
        windowDuration = "10 minutes", watermarkDelay = "10 minutes")
      .toDF().writeStream.format("memory").queryName("s32late").outputMode("append").start()
    try {
      // batch 1: window [00:00,00:10) uses its full budget; the far-future
      // row pushes the watermark to 3600−600 = 3000 s, past that window's
      // end — its counter is evicted from state
      ms.addData((1L, "en", "a b c", at(10)), (2L, "en", "x", at(3600)))
      q.processAllAvailable()
      // batch 2: a late row targeting the EVICTED window — without the
      // eviction-criterion row filter it would recreate the window with
      // a fresh zero budget and be admitted past the cap
      ms.addData((3L, "en", "a", at(20)))
      q.processAllAvailable()
      val got = spark.table("s32late").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L), s"evicted-window late row must be dropped: $got")
    } finally q.stop()
  }

  test("S11: fused admission gate equals contamination-filter + quota; cap survives batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.dedup.Contamination
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = GraftSession.table(spark, sfDir, "documents")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val idx = Contamination.collectIndex(train)
    val base = 1735689600L // aligned to the 10-minute window grid
    val rows = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        new java.sql.Timestamp((base + r.getLong(0) % 1200) * 1000)))
    val ms = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val in = ms.toDF().toDF("doc_id", "lang", "text", "ts")
    val q = Streams.admissionGate(in, idx, "lang", "doc_id", cap = 3)
      .toDF().writeStream.format("memory").queryName("s11").outputMode("append").start()
    try {
      ms.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("s11").collect()
      // batch twin: the distributed gate's numbers + md5-ranked quota
      val cont = Contamination.overlap(train, docs).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
        .toMap
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      val expected = rows
        .filter { case (id, _, _, _) => cont.get(id).forall(!_._4) } // absent (too short) = clean
        .groupBy { case (id, lang, _, _) => (lang, (id % 1200) / 600) }
        .values.flatMap(grp =>
          grp.sortBy { case (id, _, _, _) => (md5hex(id.toString), id) }.take(3).map(_._1))
        .toSet
      assert(got.map(_.getLong(0)).toSet == expected)
      got.foreach { r =>
        assert(r.getDouble(6) < 0.2, "contaminated doc admitted")
        cont.get(r.getLong(0)).foreach { case (nsh, nc, c, _) =>
          assert((r.getInt(4).toLong, r.getInt(5).toLong, r.getDouble(6)) == ((nsh, nc, c)),
            s"doc ${r.getLong(0)}: fused gate's numbers diverge from the batch gate")
        }
      }
      // re-sending everything must not breach any (group, window) cap:
      // admission counts live in state across micro-batches
      ms.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val counts = spark.table("s11").groupBy("group", "window_start")
        .count().collect().map(_.getLong(2))
      assert(counts.nonEmpty && counts.forall(_ <= 3))
    } finally q.stop()
  }

  test("S13: streaming session windows equal the batch gap sessionize") {
    val dir = Files.createTempDirectory("graft_s13_").toString + "/in"
    val ev = GraftSession.table(spark, sfDir, "events")
    // one file = one micro-batch holding ALL events (watermark 0, nothing
    // late-dropped); the far-future sentinel is batch 2 and closes every
    // session
    ev.coalesce(1).write.parquet(dir)
    val maxTs = ev.agg(max("ts")).collect()(0).getTimestamp(0)
    ev.limit(1)
      .withColumn("user_id", lit(999999L))
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 2L * 86400 * 1000)))
      .coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir)
    val got = runToTable(Streams.sessionizedCounts(s), "s13", "append")
      .filter(col("user_id") =!= 999999L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val want = operators.Analytics.eventsSessionize(spark, sfDir)
      .select("user_id", "session_start", "session_end", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(got.nonEmpty && got == want)
  }

  test("S17: streaming funnel equals the batch fold after idle timeout") {
    val dir = Files.createTempDirectory("graft_s17_").toString + "/in"
    val ev = GraftSession.table(spark, sfDir, "events")
    ev.coalesce(1).write.parquet(dir)
    val maxTs = ev.agg(max("ts")).collect()(0).getTimestamp(0)
    // sentinels must be a FUNNEL type (the operator filters before the
    // watermark); two of them → batch 2 advances the watermark past every
    // user's idle TTL, batch 3 fires the timeouts the advance armed
    def sentinel(days: Long) = ev.limit(1)
      .withColumn("user_id", lit(999999999L))
      .withColumn("event_type", lit("view"))
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + days * 86400 * 1000)))
    sentinel(1).coalesce(1).write.mode("append").parquet(dir)
    sentinel(2).coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir)
    // keepEarliest large enough to be exact on this corpus → the fold
    // must equal the batch twin bit-for-bit, micros included
    val got = runToTable(Streams.streamingFunnel(s, keepEarliest = 1 << 20).toDF(), "s17", "append")
      .filter(col("user_id") =!= 999999999L)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))
      .toSet
    val want = operators.Analytics.eventsFunnel(spark, sfDir)
      .select(col("user_id"), unix_micros(col("t1")).as("t1_us"),
        unix_micros(col("t2")).as("t2_us"), unix_micros(col("t3")).as("t3_us"), col("stage"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))
      .toSet
    assert(got.nonEmpty && got == want)
  }

  test("S20: streaming transitions equal the batch matrix after idle timeout") {
    val dir = Files.createTempDirectory("graft_s20_").toString + "/in"
    val ev = GraftSession.table(spark, sfDir, "events")
    ev.coalesce(1).write.parquet(dir)
    val maxTs = ev.agg(max("ts")).collect()(0).getTimestamp(0)
    // same harness as S17: two far-future sentinels — one to advance the
    // watermark past every user's idle TTL, one to fire the armed timeouts
    def sentinel(days: Long) = ev.limit(1)
      .withColumn("user_id", lit(999999999L))
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + days * 86400 * 1000)))
    sentinel(1).coalesce(1).write.mode("append").parquet(dir)
    sentinel(2).coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir)
    val pairs = runToTable(Streams.streamingTransitions(s).toDF(), "s20", "append")
      .filter(col("user_id") =!= 999999999L)
    val got = pairs.groupBy("from_type", "to_type").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = operators.Analytics.eventsTransitions(spark, sfDir)
      .select("from_type", "to_type", "n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got == want)
  }

  test("S12: streaming weighted sample emits closed windows equal to the batch twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Curation
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = GraftSession.table(spark, sfDir, "documents")
    val base = 1735689600L
    val rows = docs.select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        new java.sql.Timestamp((base + r.getLong(0) % 1200) * 1000)))
    val ms = MemoryStream[(Long, String, Long, java.sql.Timestamp)]
    val in = ms.toDF().toDF("doc_id", "lang", "n_chars", "ts")
    val q = Streams.streamingWeightedSample(in, "lang", "doc_id",
        greatest(col("n_chars"), lit(1)).cast("double"), k = 3)
      .toDF().writeStream.format("memory").queryName("s12").outputMode("append").start()
    try {
      // two batches (cross-batch top-set merge), then a far-future
      // sentinel so the watermark closes both 10-minute windows
      val (b1, b2) = rows.partition(_._1 % 2 == 0)
      ms.addData(b1.toSeq: _*); q.processAllAvailable()
      ms.addData(b2.toSeq: _*); q.processAllAvailable()
      assert(spark.table("s12").isEmpty, "nothing may emit before a window closes")
      ms.addData((999999L, "en", 1L, new java.sql.Timestamp((base + 86400L) * 1000)))
      q.processAllAvailable()
      val got = spark.table("s12").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000 - base, r.getLong(2), r.getInt(3)))
        .toSet
      val want = (0L to 1L).flatMap { wi =>
        val sub = docs.filter(col("doc_id") % 1200 >= wi * 600 && col("doc_id") % 1200 < (wi + 1) * 600)
        Curation.weightedSample(sub, "lang", "doc_id",
            greatest(col("n_chars"), lit(1)).cast("double"), k = 3)
          .select("lang", "doc_id", "sample_rank").collect()
          .map(r => (r.getString(0), wi * 600, r.getLong(1), r.getInt(2)))
      }.toSet
      assert(got.nonEmpty && got == want)
    } finally q.stop()
  }

  test("S19: streaming PIT enrichment equals the batch temporal join per event") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types.TimestampType
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two-version SCD2 dimension, as in the A27 driver query
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_pit_").toString)
    store.createTable("dim",
      Seq("c_custkey" -> "bigint", "c_mktsegment" -> "varchar(12)"), Seq("c_custkey"))
    val cust = GraftSession.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    store.scd2("dim", cust, clock = lit("2024-01-01 00:00:00").cast(TimestampType))
    store.scd2("dim", cust.filter(col("c_custkey") < 100)
      .select(col("c_custkey"), lit("MOVED").as("c_mktsegment")),
      clock = lit("2024-01-15 00:00:00").cast(TimestampType))
    val dim = store.readTable("dim")
    val events = GraftSession.table(spark, sfDir, "events")
      .select("event_id", "user_id", "ts")
    val rows = events.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val ms = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val in = ms.toDF().toDF("event_id", "user_id", "ts")
    val q = Streams.pitEnrich(in, dim, "user_id", "c_custkey")
      .select(col("event_id"), coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
      .writeStream.format("memory").queryName("s19").outputMode("append").start()
    try {
      val (b1, b2) = rows.partition(_._1 % 2 == 0)
      ms.addData(b1.toSeq: _*); q.processAllAvailable()
      ms.addData(b2.toSeq: _*); q.processAllAvailable()
      val got = spark.table("s19").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val want = Streams.pitEnrich(events, dim, "user_id", "c_custkey")
        .select(col("event_id"), coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got.nonEmpty && got == want)
      // the enrichment is version-sensitive: both segments appear for
      // users the second SCD2 pass moved
      assert(got.exists(_._2 == "MOVED"))
    } finally q.stop()
  }

  test("S18: streaming pack equals the batch packer when fed in hash order; offsets survive batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Curation
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = GraftSession.table(spark, sfDir, "documents")
      .withColumn("__n", size(graft.functions.Text.tokens(col("text"))).cast("long"))
    // global hash order per the batch packer's contract: feed batch 1 =
    // first half of that order, batch 2 = rest — the within-batch sort
    // plus the carried offset must then reproduce the batch packing
    val ordered = docs
      .select(col("doc_id"), col("lang"), col("__n"), md5(col("doc_id").cast("string")).as("__hk"))
      .orderBy("__hk", "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ms = MemoryStream[(Long, String, Long)]
    val in = ms.toDF().toDF("doc_id", "lang", "__n")
    val q = Streams.streamingPack(in, "lang", "doc_id", col("__n"), seqLen = 512, shards = 8)
      .toDF().writeStream.format("memory").queryName("s18").outputMode("append").start()
    try {
      val (b1, b2) = ordered.splitAt(ordered.length / 2)
      ms.addData(b1.toSeq: _*); q.processAllAvailable()
      ms.addData(b2.toSeq: _*); q.processAllAvailable()
      val got = spark.table("s18").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toSet
      val want = Curation.packSequences(docs, "lang", "doc_id", col("__n"),
          seqLen = 512, shards = 8)
        .select(col("doc_id"), col("lang"), col("pack_shard").cast("int"),
          col("n_tokens"), col("seq_id"), col("start_off")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toSet
      assert(got.size == ordered.length)
      assert(got == want)
    } finally q.stop()
  }

  test("S34: streaming no-split pack equals the batch packer in hash order; bins survive batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Curation
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = GraftSession.table(spark, sfDir, "documents")
      .withColumn("__n", size(graft.functions.Text.tokens(col("text"))).cast("long"))
    val ordered = docs
      .select(col("doc_id"), col("lang"), col("__n"), md5(col("doc_id").cast("string")).as("__hk"))
      .orderBy("__hk", "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ms = MemoryStream[(Long, String, Long)]
    val in = ms.toDF().toDF("doc_id", "lang", "__n")
    val q = Streams.streamingPackNoSplit(in, "lang", "doc_id", col("__n"),
        seqLen = 48, shards = 8)
      .toDF().writeStream.format("memory").queryName("s34").outputMode("append").start()
    try {
      val (b1, b2) = ordered.splitAt(ordered.length / 2)
      ms.addData(b1.toSeq: _*); q.processAllAvailable()
      ms.addData(b2.toSeq: _*); q.processAllAvailable()
      val got = spark.table("s34").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
      val want = Curation.packNoSplit(docs, "lang", "doc_id", col("__n"),
          seqLen = 48, shards = 8)
        .select(col("doc_id"), col("lang"), col("pack_shard").cast("int"),
          col("n_tokens"), col("bin_seq"), col("start_off"), col("overflow"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
      assert(got.size == ordered.length)
      assert(got == want)
    } finally q.stop()
  }

  test("S14: streaming heavy hitters equal the exact batch top-k per closed window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.expressions.Window
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = GraftSession.table(spark, sfDir, "documents")
    val base = 1735689600L
    val rows = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        new java.sql.Timestamp((base + r.getLong(0) % 1200) * 1000)))
    val ms = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val in = ms.toDF().toDF("doc_id", "lang", "text", "ts")
      .select(col("lang"), explode(split(col("text"), " ")).as("term"), col("ts"))
    val q = Streams.streamingHeavyHitters(in, "lang", "term", k = 5, capacity = 65536)
      .toDF().writeStream.format("memory").queryName("s14").outputMode("append").start()
    try {
      val (b1, b2) = rows.partition(_._1 % 2 == 0)
      ms.addData(b1.toSeq: _*); q.processAllAvailable()
      ms.addData(b2.toSeq: _*); q.processAllAvailable()
      ms.addData((999999L, "en", "x", new java.sql.Timestamp((base + 86400L) * 1000)))
      q.processAllAvailable()
      val got = spark.table("s14").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000 - base,
          r.getInt(2), r.getString(3), r.getLong(4), r.getLong(5))).toSet
      val want = (0L to 1L).flatMap { wi =>
        docs.filter(col("doc_id") % 1200 >= wi * 600 && col("doc_id") % 1200 < (wi + 1) * 600)
          .select(col("lang"), explode(split(col("text"), " ")).as("term"))
          .groupBy("lang", "term").agg(count(lit(1)).as("cnt"))
          .withColumn("rank", row_number().over(
            Window.partitionBy("lang").orderBy(col("cnt").desc, col("term"))))
          .filter(col("rank") <= 5)
          .collect()
          .map(r => (r.getString(0), wi * 600, r.getInt(3), r.getString(1), r.getLong(2), 0L))
      }.toSet
      // exact regime (capacity >> vocabulary): identical ranks, counts, zero error
      assert(got.nonEmpty && got == want)
    } finally q.stop()
  }

  test("S11b: Bloom-indexed admission equals the exact-index gate at tiny fpp") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.dedup.Contamination
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = GraftSession.table(spark, sfDir, "documents")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val base = 1735689600L
    val rows = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        new java.sql.Timestamp((base + r.getLong(0) % 1200) * 1000)))
    def run(name: String, mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[Streams.GatedAdmit]) = {
      val ms = MemoryStream[(Long, String, String, java.sql.Timestamp)]
      val q = mk(ms.toDF().toDF("doc_id", "lang", "text", "ts"))
        .toDF().writeStream.format("memory").queryName(name).outputMode("append").start()
      try { ms.addData(rows.toSeq: _*); q.processAllAvailable() } finally q.stop()
      spark.table(name).orderBy("doc_id").collect().toSeq
    }
    val exact = run("s11_exact",
      in => Streams.admissionGate(in, Contamination.collectIndex(train), "lang", "doc_id", cap = 3))
    // at fpp 1e-6 over this corpus's shingle universe, false positives
    // are (deterministically) absent — the gates must agree exactly
    val bloom = run("s11_bloom",
      in => Streams.admissionGateBloom(in, Contamination.bloomIndex(train, fpp = 1e-6), "lang", "doc_id", cap = 3))
    assert(exact.nonEmpty && exact == bloom)
  }

  test("S6: bucket state survives a query restart via checkpoint") {
    import graft.dedup.Dedup
    val docs = GraftSession.table(spark, sfDir, "documents")
    val base = Files.createTempDirectory("graft_s6_restart_").toString
    val in = base + "/in"
    val cp = base + "/checkpoint"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val out = base + "/out"
    def runOnce(): Unit = {
      // memory sinks can't recover from a checkpoint; the parquet sink
      // is the fault-tolerant one (exactly-once via the file log)
      val s = spark.readStream.schema(schema).parquet(in)
        .withColumn("ts", timestamp_seconds(lit(1735689600L) + col("doc_id")))
      val q = Streams.minhashCandidates(s).toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // second half of the corpus arrives AFTER the first query stopped;
    // the restarted query must recover bucket state from the checkpoint
    // to pair new docs with pre-restart ones
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(in)
    runOnce()
    val got = spark.read.parquet(out).select("a_id", "b_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = Dedup.ngramJaccardPairs(docs, tau = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossParity = strong.filter(p => (p._1 + p._2) % 2 == 1)
    assert(crossParity.nonEmpty, "test corpus lost its cross-parity duplicate pairs")
    assert(crossParity.subsetOf(got),
      s"state not recovered across restart; missing ${crossParity -- got}")
  }

  test("S6: bucket state is evicted once the watermark passes the horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    def at(offsetSec: Long) = new java.sql.Timestamp(base.getTime + offsetSec * 1000)
    val text = "the quick brown fox jumps over the lazy dog again and again tonight"
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val in = ms.toDF().toDF("doc_id", "text", "ts")
    val q = Streams.minhashCandidates(in, watermarkDelay = "0 seconds", horizonMs = 60000L)
      .toDF().writeStream.format("memory").queryName("s6_evict").outputMode("append").start()
    try {
      ms.addData((1L, text, at(0)))
      q.processAllAvailable()
      ms.addData((2L, text, at(10))) // within horizon of doc 1 → pair
      q.processAllAvailable()
      ms.addData((100L, "completely unrelated words fill this other sentence body", at(7200)))
      q.processAllAvailable() // watermark advances past 1/2's horizon
      ms.addData((3L, text, at(7201))) // same text, but old state must be gone
      q.processAllAvailable()
      val pairs = spark.table("s6_evict").select("a_id", "b_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"in-horizon pair missed: $pairs")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
        s"state not evicted past the horizon: $pairs")
    } finally q.stop()
  }

  test("S7: streaming upsert sink merges micro-batches into a TableStore table") {
    import graft.store.TableStore
    val store = new TableStore(spark, Files.createTempDirectory("graft_s7_").toString)
    store.createTable("ev", Seq(
      "event_id" -> "bigint", "user_id" -> "bigint", "event_type" -> "varchar(20)"),
      Seq("event_id"), buckets = 8)
    // duplicated stream: the same events arrive twice across micro-batches;
    // keyed upsert must converge to one row per event_id
    val in = Files.createTempDirectory("graft_s7_in_").toString + "/in"
    val ev = GraftSession.table(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type").limit(2000)
    ev.coalesce(1).write.mode("append").parquet(in)
    ev.coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
    val q = Streams.upsertSink(s, store, "ev").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(store.readTable("ev").count() == ev.count())
    assert(store.primaryKeyViolations("ev").count() == 0)
  }

  test("S23: streaming anomaly gate matches the batch z-score per closed window") {
    import graft.operators.Analytics
    val ev = GraftSession.table(spark, sfDir, "events")
    val baseline = Analytics.anomalyMoments(Analytics.anomalyDailySums(ev))
    val got = runToTable(Streams.streamingAnomaly(stream, baseline), "s23", "append")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(got.nonEmpty, "no windows closed under the watermark")
    val want = Analytics.anomalyScore(
        Analytics.anomalyDailySums(ev).join(baseline, "event_type"))
      .select(col("event_type"), col("day_num"), col("daily_value"), col("z"), col("is_anomaly"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    got.foreach { case (ty, day, v, z, fl) =>
      val dayNum = (day.getTime / 86400000L).toInt
      assert(want((ty, dayNum)) == ((v, z, fl)),
        s"window ($ty, $dayNum) diverged from the batch score")
    }
    // all but each type's last TWO days must emit (the watermark sits
    // maxTs − 1 day, so the final day is open and the one before it has
    // window-end just past the watermark)
    val nTypes = ev.select("event_type").distinct().count().toInt
    assert(got.length >= want.size - 2 * nTypes)
  }

  test("S22: streaming ANN probe equals the batch IVF answer regardless of batch split") {
    import graft.similarity.Ann
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = GraftSession.table(spark, sfDir, "embeddings").cache()
    val cents = Ann.trainIvfCentroids(emb, nCentroids = 4, iters = 3)
    val qs = emb.filter(col("vec_id") % 10 === 0)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq
    val (q1, q2) = qs.splitAt(qs.size / 2)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Int, Double)]()
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = Streams.annProbeSink(
      ms.toDF().toDF("vec_id", "embedding"), emb, cents,
      out = df => got.synchronized {
        got ++= df.as[(Long, Long, Int, Double)].collect()
      }).start()
    try {
      ms.addData(q1); q.processAllAvailable()
      ms.addData(q2); q.processAllAvailable()
    } finally q.stop()
    val batch = Ann.topKIvf(emb, emb.filter(col("vec_id") % 10 === 0),
        nCentroids = 4, centroids = Some(cents))
      .as[(Long, Long, Int, Double)].collect()
    assert(got.sorted.toSeq == batch.sorted.toSeq,
      "streamed probe answers diverged from the batch operator")
  }

  test("S21: streaming JSONL directory ingest lands micro-batches in the store with live stats") {
    import graft.store.TableStore
    import graft.sources.TextSources
    import org.apache.spark.sql.types._
    val in = Files.createTempDirectory("graft_s21_in_").toString + "/jsonl"
    val docs = GraftSession.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "n_chars")
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
    b1.coalesce(1).write.mode("append").json(in)
    val store = new TableStore(spark, Files.createTempDirectory("graft_s21_").toString)
    store.createTable("d", Seq(
      "doc_id" -> "bigint", "lang" -> "varchar(8)", "n_chars" -> "bigint"),
      Seq("doc_id"), buckets = 4)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("n_chars", LongType)))
    val q = Streams.insertSinkWithStats(
      TextSources.readJsonlStream(spark, in, schema, maxFilesPerTrigger = 1),
      store, "d", statsColumns = Seq("doc_id", "n_chars")).start()
    try {
      q.processAllAvailable()
      assert(store.readTable("d").count() == b1.count(), "first file not ingested")
      // a file landing AFTER the query started becomes its own batch
      b2.coalesce(1).write.mode("append").json(in)
      q.processAllAvailable()
      assert(store.readTable("d").count() == docs.count())
      // full-fidelity: the store equals the source relation
      assert(store.readTable("d", orderBy = Seq("doc_id"))
        .as[(Long, String, Long)].collect().toSeq ==
        docs.orderBy("doc_id").as[(Long, String, Long)].collect().toSeq)
      // stats stayed one-batch-fresh: a keyed point read prunes to a
      // strict subset of the table's files
      val one = docs.select("doc_id").as[Long].head()
      val pruned = store.readTable("d", where = Some(s"doc_id = $one"))
      assert(pruned.as[(Long, String, Long)].collect().length == 1)
      assert(pruned.inputFiles.length < store.readTable("d").inputFiles.length,
        "point read did not prune the streamed files")
    } finally q.stop()
  }

  test("S16: streaming CDC apply replicates a table from its own change feed") {
    import graft.store.TableStore
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // source of truth: three generations of keyed mutations
    val src = new TableStore(spark, Files.createTempDirectory("graft_s16_src_").toString)
    src.createTable("t", Seq("k" -> "int", "v" -> "varchar(10)"), Seq("k"))
    src.insert("t", Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    src.merge("t", Seq((2, "B"), (4, "d")).toDF("k", "v"))  // upd 2; ins 4; del 1, 3
    src.upsert("t", Seq((4, "D"), (5, "e")).toDF("k", "v")) // upd 4; ins 5
    val gens = src.snapshots("t").map(_._1)
    // replica (bucketed — both sink halves bucket-prune): one
    // generation's change feed per micro-batch
    val rep = new TableStore(spark, Files.createTempDirectory("graft_s16_rep_").toString)
    rep.createTable("t", Seq("k" -> "int", "v" -> "varchar(10)"), Seq("k"), buckets = 4)
    val ms = MemoryStream[(Int, String, String)]
    val in = ms.toDF().toDF("k", "v", "_change_type")
    val q = Streams.applyChangesSink(in, rep, "t").start()
    try {
      gens.sliding(2).foreach { w =>
        ms.addData(src.readChanges("t", w.head, w.last)
          .as[(Int, String, String)].collect().toIndexedSeq)
        q.processAllAvailable()
      }
      assert(rep.readTable("t", orderBy = Seq("k")).as[(Int, String)].collect().toSeq ==
        src.readTable("t", orderBy = Seq("k")).as[(Int, String)].collect().toSeq,
        "replica diverged from source after applying its change feed")
      // a batch holding a key's full lifecycle converges to absent;
      // preimages are informational and must not resurrect old values.
      // The whole batch (upserts AND deletes) is ONE commit — r10's
      // crash-window fix; the r7 form committed the halves separately
      val repGens = rep.snapshots("t").size
      ms.addData(Seq((9, "x", "insert"), (9, "x", "delete"),
        (5, "stale", "update_preimage")))
      q.processAllAvailable()
      assert(rep.snapshots("t").size == repGens + 1,
        "a mixed upsert+delete batch must land as a single commit")
      assert(rep.readTable("t", where = Some("k = 9")).count() == 0,
        "insert→delete in one batch must converge to the key absent")
      assert(rep.readTable("t", where = Some("k = 5")).select("v")
        .as[String].collect().toSeq == Seq("e"), "preimage must be skipped")
    } finally q.stop()
  }

  test("S33: streaming reuse monitor reconciles with the batch L67 report after a doc-ordered drain") {
    import graft.store.TableStore
    import graft.dedup.Dedup
    val store = new TableStore(spark, Files.createTempDirectory("graft_s33_").toString)
    store.createTable("seen", Seq("h" -> "varchar(32)"), Seq("h"))
    store.createTable("reuse", Seq("batch_id" -> "bigint", "source" -> "varchar(16)",
      "n_paras" -> "bigint", "n_novel" -> "bigint", "n_reused" -> "bigint"), Seq.empty)
    val docs = GraftSession.table(spark, sfDir, "documents")
    val in = Files.createTempDirectory("graft_s33_in_").toString + "/in"
    // two doc-ordered slices → arrival order == doc_id order, so the
    // streaming first-seen rule coincides with the batch min-winner
    val cut = 250L
    docs.filter(col("doc_id") < cut).coalesce(1).write.mode("append").parquet(in)
    docs.filter(col("doc_id") >= cut).coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
    val q = Streams.reuseMonitorSink(s, store, "seen", "reuse")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = store.readTable("reuse").groupBy("source")
      .agg(sum("n_paras").as("p"), sum("n_novel").as("nv"), sum("n_reused").as("ru"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = Dedup.dedupRateBySource(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap // (n_paras, n_dup)
    assert(got.keySet == want.keySet)
    got.foreach { case (src, (p, _, ru)) =>
      assert((p, ru) == want(src), s"source $src diverged from the batch report")
    }
    assert(got.values.map(_._3).sum > 0, "no reuse detected — monitor vacuous")
    // the seen-set holds exactly the corpus's distinct paragraphs
    assert(store.readTable("seen").count() == got.values.map(_._2).sum)
  }

  test("S15: streaming insert sink keeps file statistics fresh per batch") {
    import graft.store.TableStore
    val store = new TableStore(spark, Files.createTempDirectory("graft_s15_").toString)
    store.createTable("ev", Seq("event_id" -> "bigint", "user_id" -> "bigint"),
      Seq("event_id"))
    val in = Files.createTempDirectory("graft_s15_in_").toString + "/in"
    val ev = spark.range(0, 4000)
      .select(col("id").as("event_id"), (col("id") % 7).as("user_id"))
    // 4 contiguous slices → 4 micro-batches with disjoint event_id ranges
    (0 until 4).foreach(i => ev
      .filter(col("event_id") >= i * 1000 && col("event_id") < (i + 1) * 1000)
      .coalesce(1).write.mode("append").parquet(in))
    val schema = spark.read.parquet(in).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
    val q = Streams.insertSinkWithStats(s, store, "ev")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(store.readTable("ev").count() == ev.count())
    // zone maps cover every batch's files: a point read prunes to ≤ the
    // per-batch file count instead of scanning the whole table
    val all = store.readTable("ev").inputFiles.length
    val point = store.readTable("ev", where = Some("event_id = 123"))
    assert(point.count() == 1)
    assert(point.inputFiles.length < all,
      s"stats did not prune: ${point.inputFiles.length} of $all files")
  }

  test("S15 × C27: bloom-maintaining sink keeps equality pruning fresh on interleaved batches") {
    import graft.store.TableStore
    val store = new TableStore(spark, Files.createTempDirectory("graft_s15b_").toString)
    store.createTable("ev", Seq("event_id" -> "bigint", "user_id" -> "bigint"),
      Seq("event_id"))
    val in = Files.createTempDirectory("graft_s15b_in_").toString + "/in"
    val ev = spark.range(0, 4000)
      .select((col("id") * 2).as("event_id"), (col("id") % 7).as("user_id"))
    // 4 modulo slices → every micro-batch's file spans ~the whole key
    // range, so min/max zone maps keep every file for equality probes
    (0 until 4).foreach(i => ev.filter(col("event_id") % 8 === i * 2)
      .coalesce(1).write.mode("append").parquet(in))
    val schema = spark.read.parquet(in).schema
    val s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
    val q = Streams.insertSinkWithStats(s, store, "ev", bloomBits = 1 << 14)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(store.readTable("ev").count() == 4000)
    val all = store.readTable("ev").inputFiles.length
    val point = store.readTable("ev", where = Some("event_id = 42"))
    assert(point.count() == 1)
    assert(point.inputFiles.length <= 2,
      s"bloom did not prune: ${point.inputFiles.length} of $all files")
    // in-range ABSENT key (odd): every ingested file bloom-cut
    val absent = store.readTable("ev", where = Some("event_id = 41"))
    assert(absent.inputFiles.length <= 1 && absent.count() == 0)
  }

  test("S3: flatMapGroupsWithState running totals equal batch aggregation") {
    val got = runToTable(Streams.runningTotals(stream).toDF(), "s3", "update")
    // keep the last update per user (multiple micro-batches may emit)
    val last = got.groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("total_value").as("total_value"))
      .orderBy("user_id").collect()
    val want = GraftSession.table(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .orderBy("user_id").collect()
    assert(last.length == want.length)
    last.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      assert(g.getLong(1) == w.getLong(1))
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-6)
    }
  }

  test("S35: streaming FK monitor flags orphans per batch; NULL FKs exempt") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.store.TableStore
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft_s35_").toString)
    store.createTableFromDataFrame("parent",
      Seq((1L, "p1"), (2L, "p2")).toDF("pk", "pname"), Seq("pk"), infer = false)
    val ms = MemoryStream[(Long, Option[Long])]
    val out = Streams.fkMonitor(ms.toDF().toDF("ck", "fk"),
      store, "parent", Seq("fk"), Seq("pk"))
    val q = out.writeStream.format("memory").queryName("s35").outputMode("append").start()
    try {
      ms.addData((10L, Some(1L)), (11L, Some(9L)), (12L, None))
      q.processAllAvailable()
      val b1 = spark.table("s35").collect()
        .map(r => (r.getLong(0), r.getBoolean(2))).toMap
      assert(b1 == Map(10L -> false, 11L -> true, 12L -> false),
        s"batch-1 verdicts wrong: $b1")
      // the monitor's verdict matches the batch audit's orphan set
      val batchOrphans = store.fkViolations("parent", Seq("pk"), "parent", Seq("pk"))
      assert(batchOrphans.count() == 0) // sanity: parent self-audits clean
      // pinned-at-start contract: a parent insert between triggers does
      // NOT change this query's verdicts (the file listing is captured
      // at plan time — the liveness path is fkMonitorSink, below)
      store.insert("parent", Seq((9L, "p9")).toDF("pk", "pname"))
      ms.addData((13L, Some(9L)))
      q.processAllAvailable()
      val b2 = spark.table("s35").collect()
        .map(r => (r.getLong(0), r.getBoolean(2))).toMap
      assert(b2(13L) == true, "pinned query unexpectedly saw the new parent key")
      assert(b2(11L) == true, "already-emitted verdicts must not rewrite")
    } finally q.stop()
  }

  test("S35b: the foreachBatch FK monitor sees parent keys inserted between triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.store.TableStore
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft_s35b_").toString)
    store.createTableFromDataFrame("parent",
      Seq((1L, "p1")).toDF("pk", "pname"), Seq("pk"), infer = false)
    val got = scala.collection.mutable.Map.empty[Long, Boolean]
    val ms = MemoryStream[(Long, Option[Long])]
    val q = Streams.fkMonitorSink(ms.toDF().toDF("ck", "fk"),
        store, "parent", Seq("fk"), Seq("pk")) { verdicts =>
        verdicts.collect().foreach(r => got(r.getLong(0)) = r.getBoolean(2))
      }.start()
    try {
      ms.addData((10L, Some(1L)), (11L, Some(9L)))
      q.processAllAvailable()
      assert(got(10L) == false && got(11L) == true, s"batch-1 verdicts wrong: $got")
      store.insert("parent", Seq((9L, "p9")).toDF("pk", "pname"))
      ms.addData((12L, Some(9L)))
      q.processAllAvailable()
      assert(got(12L) == false, "live parent key not visible to the next trigger")
    } finally q.stop()
  }

  test("S37: lateness monitor judges against the PRIOR batch's high-watermark, per group") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val ms = MemoryStream[(String, Long, java.sql.Timestamp)]
    val q = Streams.latenessMonitor(ms.toDF().toDF("event_type", "event_id", "ts"),
        "event_type", "event_id", delayMs = 60000L)
      .toDF().writeStream.format("memory").queryName("s37").outputMode("append").start()
    try {
      // batch 1: first sight of each group — nothing can be late yet,
      // even the out-of-order row within the batch
      ms.addData(("a", 1L, at(600)), ("a", 2L, at(0)), ("b", 3L, at(300)))
      q.processAllAvailable()
      // batch 2: 'a' straggler 90 s behind the 600 s mark (60 s grace →
      // 30 s excess); a fresh 'a' row is fine; 'b' judges against ITS
      // OWN 300 s mark (240 s-old row is within 60 s grace)
      ms.addData(("a", 4L, at(510)), ("a", 5L, at(700)), ("b", 6L, at(240)))
      q.processAllAvailable()
      val got = spark.table("s37").collect()
        .map(r => r.getLong(1) -> ((r.getLong(3), r.getBoolean(4)))).toMap
      assert(got(1L) == ((0L, false)) && got(2L) == ((0L, false)) && got(3L) == ((0L, false)))
      assert(got(4L) == ((30000L, true)), s"straggler excess wrong: ${got(4L)}")
      assert(got(5L) == ((0L, false)))
      assert(got(6L) == ((0L, false)), "group b must judge against its own mark")
      // batch 3: the mark advanced to 700 s in batch 2 — a 500 s row is
      // 200 s behind, minus the 60 s grace → 140 s excess
      ms.addData(("a", 7L, at(500)))
      q.processAllAvailable()
      val g3 = spark.table("s37").collect()
        .map(r => r.getLong(1) -> r.getLong(3)).toMap
      assert(g3(7L) == 140000L)
    } finally q.stop()
  }

  test("S36: streaming summary maintenance converges to the batch recompute after every trigger") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.store.{IncrementalAgg, TableStore}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft_s36_").toString)
    store.createTableFromDataFrame("base",
      Seq((1L, "a", 10.0)).toDF("k", "g", "v"), Seq("k"), infer = false)
    store.createTableFromDataFrame("summary",
      IncrementalAgg.summarize(store.readTable("base"), Seq("g"), "v"),
      Seq("g"), infer = false)
    def check(): Unit = {
      val got = store.readTable("summary", orderBy = Seq("g")).collect().toSeq
      val want = IncrementalAgg.summarize(store.readTable("base"), Seq("g"), "v")
        .orderBy("g").collect().toSeq
      assert(got == want, s"summary diverged: $got vs $want")
    }
    val ms = MemoryStream[(Long, String, Double)]
    val q = Streams.summaryMaintenanceSink(ms.toDF().toDF("k", "g", "v"),
      store, "base", "summary", Seq("g"), "v").start()
    try {
      ms.addData((2L, "a", 20.0), (3L, "b", 30.0)) // inserts, one new group
      q.processAllAvailable()
      check()
      ms.addData((1L, "b", 15.0)) // key 1 MOVES group a→b (update via upsert)
      q.processAllAvailable()
      check()
      assert(store.readTable("summary").filter(col("g") === "a").count() == 1,
        "group a must survive with one row after the move")
      // kill-between-the-commits: a base generation lands with NO
      // maintenance (exactly the crash window between the sink's upsert
      // and its maintain call) — the durable watermark makes the next
      // trigger fold the backlog, so the summary still converges
      store.upsert("base", Seq((4L, "c", 40.0)).toDF("k", "g", "v"))
      ms.addData((5L, "c", 50.0))
      q.processAllAvailable()
      check()

      // the STREAMING MV story end to end: with the C44 rule
      // registered, an aggregate over the base is served from the
      // stream-maintained summary between triggers (fresh), and stands
      // down exactly while a base commit is awaiting the next trigger
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      import org.apache.spark.sql.types.DecimalType
      graft.plans.SummaryRewrite.register(spark, store, "base", "summary", Seq("g"), "v")
      try {
        def agg = store.readTable("base").groupBy("g")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("v").cast(DecimalType(18, 2))).as("sum_val"))
        def scans = agg.queryExecution.optimizedPlan.collect {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
            fs.location.rootPaths.map(_.toString)
        }.flatten
        assert(scans.forall(_.contains("summary")),
          "a stream-maintained summary should serve the aggregate between triggers")
        store.upsert("base", Seq((6L, "d", 60.0)).toDF("k", "g", "v"))
        assert(scans.exists(_.contains("base")),
          "a base commit awaiting its trigger must stand the rule down")
        ms.addData((7L, "d", 70.0)) // next trigger folds the backlog
        q.processAllAvailable()
        check()
        assert(scans.forall(_.contains("summary")),
          "the trigger's maintenance should restore summary routing")
      } finally graft.plans.SummaryRewrite.unregister(store, "base")
    } finally q.stop()
  }

  test("S36b: streaming min/max summary converges to the batch recompute, update-through-extremum included") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.store.{IncrementalAgg, TableStore}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft_s36b_").toString)
    store.createTableFromDataFrame("base",
      Seq((1L, "a", 10.0)).toDF("k", "g", "v"), Seq("k"), infer = false)
    store.createTableFromDataFrame("summary",
      IncrementalAgg.summarizeMinMax(store.readTable("base"), Seq("g"), "v"),
      Seq("g"), infer = false)
    def check(): Unit = {
      val got = store.readTable("summary", orderBy = Seq("g")).collect().toSeq
      val want = IncrementalAgg.summarizeMinMax(store.readTable("base"), Seq("g"), "v")
        .orderBy("g").collect().toSeq
      assert(got == want, s"minmax summary diverged: $got vs $want")
    }
    val ms = MemoryStream[(Long, String, Double)]
    val q = Streams.summaryMinMaxMaintenanceSink(ms.toDF().toDF("k", "g", "v"),
      store, "base", "summary", Seq("g"), "v").start()
    try {
      ms.addData((2L, "a", 3.0), (3L, "b", 30.0)) // growth: min of a tightens
      q.processAllAvailable()
      check()
      ms.addData((2L, "a", 50.0)) // the current MIN of a moves up — rescan path
      q.processAllAvailable()
      check()
      // backlog window: a base delete outside the sink kills b's only row
      store.delete("base", Seq(3L).toDF("k"))
      ms.addData((4L, "a", 20.0))
      q.processAllAvailable()
      check()
      assert(store.readTable("summary").filter(col("g") === "b").count() == 0)
    } finally q.stop()
  }

  test("S36c: streaming distinct-count summary converges to the batch recompute, value-churn rescan included") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.store.{IncrementalAgg, TableStore}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft_s36c_").toString)
    store.createTableFromDataFrame("base",
      Seq((1L, "a", 10L)).toDF("k", "g", "v"), Seq("k"), infer = false)
    store.createTableFromDataFrame("summary",
      IncrementalAgg.summarizeDistinct(store.readTable("base"), Seq("g"), "v", k = 3),
      Seq("g"), infer = false)
    def check(): Unit = {
      val got = store.readTable("summary", orderBy = Seq("g")).collect().toSeq
      val want = IncrementalAgg.summarizeDistinct(
        store.readTable("base"), Seq("g"), "v", k = 3)
        .orderBy("g").collect().toSeq
      assert(got == want, s"distinct summary diverged: $got vs $want")
    }
    val ms = MemoryStream[(Long, String, Long)]
    val q = Streams.summaryDistinctMaintenanceSink(ms.toDF().toDF("k", "g", "v"),
      store, "base", "summary", Seq("g"), "v", k = 3).start()
    try {
      // growth past k: register union truncates to the 3 smallest
      ms.addData((2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L), (5L, "b", 50L))
      q.processAllAvailable()
      check()
      ms.addData((2L, "a", 99L)) // value churn on an existing key — rescan
      q.processAllAvailable()
      check()
      // backlog window: a base delete outside the sink kills b
      store.delete("base", Seq(5L).toDF("k"))
      ms.addData((6L, "a", 60L))
      q.processAllAvailable()
      check()
      assert(store.readTable("summary").filter(col("g") === "b").count() == 0)
    } finally q.stop()
  }

  test("S36d: streaming multi-measure min/max summary converges to the batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.store.{IncrementalAgg, TableStore}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft_s36d_").toString)
    store.createTableFromDataFrame("base",
      Seq((1L, "a", 10.0, 1.0)).toDF("k", "g", "v", "w"), Seq("k"), infer = false)
    store.createTableFromDataFrame("summary",
      IncrementalAgg.summarizeMultiMinMax(
        store.readTable("base"), Seq("g"), Seq("v", "w")),
      Seq("g"), infer = false)
    def check(): Unit = {
      val got = store.readTable("summary", orderBy = Seq("g")).collect().toSeq
      val want = IncrementalAgg.summarizeMultiMinMax(
        store.readTable("base"), Seq("g"), Seq("v", "w"))
        .orderBy("g").collect().toSeq
      assert(got == want, s"multi-minmax summary diverged: $got vs $want")
    }
    val ms = MemoryStream[(Long, String, Double, Double)]
    val q = Streams.summaryMultiMinMaxMaintenanceSink(
      ms.toDF().toDF("k", "g", "v", "w"),
      store, "base", "summary", Seq("g"), Seq("v", "w")).start()
    try {
      ms.addData((2L, "a", 3.0, 9.0), (3L, "b", 30.0, 0.5)) // tighten both measures
      q.processAllAvailable()
      check()
      ms.addData((2L, "a", 50.0, 0.1)) // min of v AND max of w move — rescan
      q.processAllAvailable()
      check()
      store.delete("base", Seq(3L).toDF("k")) // backlog kill of group b
      ms.addData((4L, "a", 20.0, 2.0))
      q.processAllAvailable()
      check()
      assert(store.readTable("summary").filter(col("g") === "b").count() == 0)
    } finally q.stop()
  }

  test("S36e: streaming quantile-sketch summary converges by pure counter folds — no rescan under churn") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.store.{IncrementalAgg, TableStore}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft_s36e_").toString)
    store.createTableFromDataFrame("base",
      Seq((1L, "a", Some(1.2))).toDF("k", "g", "v"), Seq("k"), infer = false)
    store.createTableFromDataFrame("summary",
      IncrementalAgg.summarizeQuantile(store.readTable("base"), Seq("g"), "v"),
      Seq("g", "bin_id", "bin_upper"), infer = false)
    def check(): Unit = {
      val got = store.readTable("summary", orderBy = Seq("g", "bin_id")).collect().toSeq
      val want = IncrementalAgg.summarizeQuantile(store.readTable("base"), Seq("g"), "v")
        .orderBy("g", "bin_id").collect().toSeq
      assert(got == want, s"quantile summary diverged: $got vs $want")
    }
    val ms = MemoryStream[(Long, String, Option[Double])]
    val q = Streams.summaryQuantileMaintenanceSink(ms.toDF().toDF("k", "g", "v"),
      store, "base", "summary", Seq("g"), "v").start()
    try {
      // growth incl. a NULL observation (no bucket) and a new group
      ms.addData((2L, "a", Some(900.0)), (3L, "b", Some(42.0)),
        (4L, "a", Option.empty[Double]))
      q.processAllAvailable()
      check()
      // value churn: pre/post images move the observation between
      // buckets as a −1/+1 counter pair; null→value adds one
      ms.addData((2L, "a", Some(0.05)), (4L, "a", Some(7.0)))
      q.processAllAvailable()
      check()
      // backlog window: a base delete outside the sink kills b's bucket
      store.delete("base", Seq(3L).toDF("k"))
      ms.addData((5L, "a", Some(1.2)))
      q.processAllAvailable()
      check()
      assert(store.readTable("summary").filter(col("g") === "b").count() == 0,
        "a group with no surviving observations must leave no bucket rows")
    } finally q.stop()
  }

  test("S38: CDC-apply sink folds last-verdict-per-key atomically; replays are idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.store.TableStore
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft_s38_").toString)
    store.createTable("t",
      Seq("k" -> "bigint", "v" -> "varchar(10)"), Seq("k"), buckets = 4)
    def state(): Seq[(Long, String)] =
      store.readTable("t", orderBy = Seq("k")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ms = MemoryStream[(Long, String, Boolean, Long)]
    val q = Streams.cdcApplySink(ms.toDF().toDF("k", "v", "__del", "seq"),
      store, "t", Seq("k"), "__del", "seq").start()
    try {
      ms.addData((1L, "a", false, 1L), (2L, "b", false, 2L))
      q.processAllAvailable()
      assert(state() == Seq((1L, "a"), (2L, "b")))
      val gens = store.snapshots("t").size
      // one batch: update k1, delete k2, insert k3, and TWO verdicts for
      // k4 — the later sequence (a delete) must win, so k4 never lands
      ms.addData((1L, "a2", false, 3L), (2L, "", true, 4L),
        (3L, "c", false, 5L), (4L, "d", false, 6L), (4L, "", true, 7L))
      q.processAllAvailable()
      assert(state() == Seq((1L, "a2"), (3L, "c")))
      assert(store.snapshots("t").size == gens + 1,
        "a trigger's verdicts must land as ONE commit")
      // replay shape: re-sending the same verdicts converges to the
      // same state (deletes of absent keys no-op, upserts re-assert)
      ms.addData((1L, "a2", false, 3L), (2L, "", true, 4L),
        (3L, "c", false, 5L), (4L, "", true, 7L))
      q.processAllAvailable()
      assert(state() == Seq((1L, "a2"), (3L, "c")))
    } finally q.stop()
  }

  test("S39: decontamination gate scrubs eval paragraphs at ingest, equal to the batch twin, replay-idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.dedup.Dedup
    import graft.store.TableStore
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft_s39_").toString)
    store.createTable("clean", Seq("doc_id" -> "bigint", "n_paras" -> "bigint",
      "n_kept" -> "bigint", "clean_text" -> "varchar(max)"), Seq("doc_id"), buckets = 4)
    val docs = GraftSession.table(spark, sfDir, "documents").select("doc_id", "text")
    val evalSet = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val rows = train.collect().map(r => (r.getLong(0), r.getString(1)))
    val ms = MemoryStream[(Long, String)]
    val q = Streams.decontamGateSink(ms.toDF().toDF("doc_id", "text"),
      evalSet, store, "clean").start()
    try {
      // two micro-batches: the cut must not depend on how the stream splits
      val (b1, b2) = rows.partition(_._1 % 2 == 0)
      ms.addData(b1.toSeq: _*); q.processAllAvailable()
      ms.addData(b2.toSeq: _*); q.processAllAvailable()
      def state(): Seq[(Long, Long, Long, String)] =
        store.readTable("clean", orderBy = Seq("doc_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      val want = Dedup.decontaminateParagraphs(train, evalSet).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      val got = state()
      assert(got == want, "streamed table diverged from the batch twin")
      // the gate must actually CUT on this corpus (paragraph-granularity
      // duplication crosses the driver split) and keep clean material
      assert(got.exists(r => r._3 < r._2), "no document lost a paragraph — vacuous gate")
      assert(got.exists(r => r._3 > 0), "no document kept a paragraph")
      // replay: re-sending a batch re-asserts the same keys (idempotent)
      ms.addData(b2.toSeq: _*); q.processAllAvailable()
      assert(state() == want, "replayed batch changed table state")
      assert(store.primaryKeyViolations("clean").count() == 0)
    } finally q.stop()
  }

  test("S40: streaming mirror maintenance keeps the hive tree ≡ base across triggers, backlog and replays") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.store.TableStore
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft_s40_").toString)
    store.createTableFromDataFrame("base",
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "seg", "v"),
      Seq("k"), infer = false)
    val mirror = Files.createTempDirectory("graft_s40m_").toString + "/m"
    def check(tag: String): Unit = {
      val got = spark.read.parquet(mirror)
        .select(col("k"), col("seg").cast("string"), col("v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSeq.sorted
      val want = store.readTable("base").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq.sorted
      assert(got == want, s"$tag: mirror diverged: $got vs $want")
    }
    val ms = MemoryStream[(Long, String, Double)]
    val q = Streams.mirrorMaintenanceSink(ms.toDF().toDF("k", "seg", "v"),
      store, "base", mirror, "seg").start()
    try {
      // trigger 1: bootstrap export + incremental sync of the batch
      // (insert into an existing segment + a brand-new segment)
      ms.addData((3L, "a", 30.0), (4L, "c", 40.0))
      q.processAllAvailable()
      check("bootstrap+insert")
      val segBFile = new java.io.File(mirror, "seg=b").listFiles().toSeq
      // trigger 2: key 1 MOVES a→c (both sides' partitions rewrite);
      // segment b untouched — its files must survive byte-identical
      ms.addData((1L, "c", 11.0))
      q.processAllAvailable()
      check("move")
      assert(new java.io.File(mirror, "seg=b").listFiles().toSeq == segBFile,
        "untouched partition was rewritten")
      // backlog: a base mutation lands OUTSIDE the sink (the crash
      // window between upsert and sync) — segment c dies entirely; the
      // next trigger folds the backlog and prunes the stale directory
      store.delete("base", Seq((1L, "c", 0.0), (4L, "c", 0.0)).toDF("k", "seg", "v")
        .select("k"))
      ms.addData((5L, "b", 50.0))
      q.processAllAvailable()
      check("backlog+segment death")
      assert(!new java.io.File(mirror, "seg=c").exists(),
        "fully-deleted segment's stale directory survived")
      // replay: identical rows re-upsert → EMPTY keyed feed → sync
      // touches nothing and the mirror stays converged
      ms.addData((5L, "b", 50.0))
      q.processAllAvailable()
      check("replay")
    } finally q.stop()
  }
}
