package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2 L12): media as opaque binary
  * columns + typed metadata extracted by a per-partition decoder.
  *
  * The Spark-side shape is real: binary column, typed Dataset,
  * mapPartitions batch iteration (one decoder instance per partition —
  * where a real decoder would amortize codec init), deterministic
  * output schema. The DECODE itself is a stub: image/audio codecs are
  * not in this container, so [[decodeStub]] derives deterministic fake
  * metadata from the bytes. Swapping in a real decoder changes only
  * that function.
  */
object Media {

  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, header: Long,
      format: String, width: Long, height: Long)

  /** STUB — a real build decodes bytes here (e.g. image dimensions,
    * audio sample rate). Deterministic fake keeps the plumbing testable. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val fmt = (n % 3) match { case 0 => "png"; case 1 => "jpg"; case _ => "wav" }
    MediaMeta(0L, n, if (bytes.nonEmpty) (bytes(0) & 0xFF).toLong else 0L,
      fmt, (n * 7) % 1024, (n * 13) % 768)
  }

  /** Frame sampling over a binary "video" column: fixed-size frames,
    * capped per document — the flatMap shape (one input row → n frame
    * rows) is the real plumbing a frame extractor needs; the frame
    * content read is the stubbed part. */
  def frameTable(docs: DataFrame, frameBytes: Int = 256, maxFrames: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "utf-8").as("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = math.min(bytes.length / frameBytes, maxFrames)
        (0 until n).map(i =>
          (id, i, i.toLong * frameBytes, (bytes(i * frameBytes) & 0xFF).toLong))
      }
      .toDF("doc_id", "frame_idx", "frame_offset", "first_byte")
  }

  /** Attach a binary media column (here: utf-8 bytes of the text — the
    * stand-in payload) and decode per partition. */
  def decodeTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "utf-8").as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder scope: real codecs init once here
        it.map { case (id, bytes) => decodeStub(bytes).copy(doc_id = id) }
      }
      .toDF()
  }
}
