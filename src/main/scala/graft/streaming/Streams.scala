package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming operators (SURVEY §2 S1–S3): the streaming twins
  * of the batch analytics surface, built on watermarks + windowed state.
  *
  * Scale notes: all three are keyed-state operators that Spark
  * distributes by group key; watermarks bound state size, so the same
  * topology runs unbounded streams on a cluster. Specs drive them with
  * `Trigger.AvailableNow` over parquet directories and assert equality
  * with the batch twins (events_tumbling etc.).
  */
object Streams {

  /** S1: stream → watermark → tumbling window aggregation (the streaming
    * twin of Analytics.eventsTumbling). */
  def windowedCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DecimalType(18, 4)).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** S2: streaming dedup by key with bounded state. */
  def dedupeByKey(stream: DataFrame, keyCol: String): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(keyCol)

  /** S5: streaming exact dedup by CONTENT hash (the streaming twin of
    * Dedup.exact): state keys are md5 digests, not documents, so state
    * size is O(distinct-content × 16 bytes) within the watermark. */
  def dedupeByContent(stream: DataFrame, textCol: String, tsCol: String): DataFrame =
    stream
      .withColumn("__content_hash", md5(col(textCol)))
      .withWatermark(tsCol, "10 minutes")
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")

  /** S4: stream-stream interval join — each purchase joined to the same
    * user's clicks in the preceding 30 minutes. Watermarks on BOTH sides
    * + the interval condition bound the join state Spark must retain. */
  def clickToPurchase(stream: DataFrame): DataFrame = {
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(clicks,
      expr("""c_user = user_id AND
              click_ts <= purchase_ts AND
              click_ts >= purchase_ts - INTERVAL 30 MINUTES"""))
      .select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")
  }

  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** S3: custom keyed state — running per-user totals via
    * flatMapGroupsWithState (the arbitrary-state API the reference's
    * users would reach for when windows don't fit). */
  def runningTotals(stream: DataFrame): Dataset[UserTotal] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) => {
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var v = v0
          rows.foreach { case (_, value) => n += 1; v += value }
          state.update((n, v))
          Iterator.single(UserTotal(user, n, v))
        })
  }
}
