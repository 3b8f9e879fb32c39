package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.store.TableStore

/** Text-format sources and sinks (CSV, JSON Lines) feeding the table
  * store — the ingestion surface a reference user gets from
  * `pandas.read_csv` / `read_json` before `create.table_from_dataframe`
  * (mssql_dataframe/core/create.py:160 takes whatever frame pandas
  * loaded). Here the load itself is distributed: Spark's CSV/JSON
  * readers scan splittable line-delimited files in parallel, and the
  * store's smallest-type inference (graft.types.Infer, ONE stats pass)
  * narrows whatever the reader produced.
  *
  * 100 TB discipline:
  *  - Line-delimited formats split by HDFS/S3 block, so a directory of
  *    uncompressed (or zstd/bzip2 splittable-codec) files parallelizes
  *    to the cluster. `multiLine=true` disables splitting (one task per
  *    file) — only quoted embedded newlines need it, and [[writeCsv]]
  *    never produces them unescaped.
  *  - Schema inference is an EXTRA pass over the data (Spark samples
  *    per `samplingRatio`). At production scale pass an explicit
  *    `schema` and skip it; inference is the convenience path, and its
  *    cost is bounded by the sampling ratio.
  *  - gzip inputs are NOT splittable (one task per .gz file); ingest
  *    jobs should re-chunk such sources once and store parquet.
  */
object TextSources {

  /** Micro-precision ISO-8601 — round-trips TimestampType exactly
    * (Spark's default JSON/CSV format renders millis and would silently
    * truncate micros). */
  val TimestampMicrosFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Distributed CSV read. `schema=None` → Spark's sampled two-pass
    * inference (ints/longs/doubles/timestamps); production callers pass
    * the schema. Defaults mirror [[writeCsv]] so a graft-written CSV
    * round-trips bit-exactly. */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      header: Boolean = true,
      delimiter: String = ",",
      nullValue: String = "",
      multiLine: Boolean = false,
      samplingRatio: Double = 1.0): DataFrame = {
    val r = spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("nullValue", nullValue)
      .option("multiLine", multiLine.toString)
      .option("timestampFormat", TimestampMicrosFormat)
      .option("samplingRatio", samplingRatio.toString)
    schema.fold(r.option("inferSchema", "true"))(r.schema)
      .csv(path)
  }

  /** Distributed JSON Lines read (one object per line — splittable;
    * this is NOT the whole-file-array JSON shape, which would need
    * `multiLine` and serialize per-file). */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      samplingRatio: Double = 1.0): DataFrame = {
    val r = spark.read
      .option("timestampFormat", TimestampMicrosFormat)
      // infer TimestampType for ISO strings instead of leaving them text
      .option("inferTimestamp", "true")
      .option("samplingRatio", samplingRatio.toString)
    schema.fold(r)(r.schema).json(path)
  }

  /** CSV sink matching [[readCsv]]'s defaults. Quotes fields containing
    * the delimiter/quote; timestamps render at micro precision. One file
    * per partition — the writer parallelizes like any Spark sink. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      delimiter: String = ","): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("timestampFormat", TimestampMicrosFormat)
      .csv(path)

  /** JSON Lines sink matching [[readJsonl]]. Null fields are omitted
    * per line (JSON convention); readers surface them as null. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", TimestampMicrosFormat)
      .json(path)

  /** Streaming JSON Lines source over a directory (S21) — the
    * file-watch ingest path: new .json/.jsonl files landing in `path`
    * become micro-batches. Structured Streaming file sources REQUIRE an
    * explicit schema (inference would race arriving files);
    * `maxFilesPerTrigger` bounds a micro-batch so a backlog drains in
    * controlled steps instead of one giant batch. Pipe into
    * [[graft.streaming.Streams.insertSinkWithStats]] for a store table
    * with one-batch-fresh zone maps. */
  def readJsonlStream(
      spark: SparkSession,
      path: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("timestampFormat", TimestampMicrosFormat)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(path)

  /** Streaming CSV twin of [[readJsonlStream]] — same file-watch
    * contract, same explicit-schema requirement, [[writeCsv]]-matching
    * parse options. */
  def readCsvStream(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      delimiter: String = ",",
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("timestampFormat", TimestampMicrosFormat)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .csv(path)

  /** Load a CSV directory into a NEW store table: distributed read +
    * smallest-type narrowing + PK — the end-to-end analog of the
    * reference's read_csv → create.table_from_dataframe workflow. */
  def ingestCsv(store: TableStore, name: String, path: String,
      primaryKey: Seq[String] = Seq.empty,
      schema: Option[StructType] = None,
      header: Boolean = true, delimiter: String = ","): Unit =
    store.createTableFromDataFrame(name,
      readCsv(store.spark, path, schema, header, delimiter), primaryKey)

  /** JSONL twin of [[ingestCsv]]. */
  def ingestJsonl(store: TableStore, name: String, path: String,
      primaryKey: Seq[String] = Seq.empty,
      schema: Option[StructType] = None): Unit =
    store.createTableFromDataFrame(name,
      readJsonl(store.spark, path, schema), primaryKey)
}
