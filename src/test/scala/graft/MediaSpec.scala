package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Media

/** L12 multimodal decode: a real ImageIO codec behind the binary-column
  * plumbing, including the corrupt-bytes degrade path. */
class MediaSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("decodeImage round-trips a real PNG: dims, bands, exact pixel mean") {
    val m = Media.decodeImage(Media.encodePng(21, 9, 173))
    assert(m.format == "png")
    assert(m.width == 21 && m.height == 9)
    assert(m.n_channels == 3)
    assert(m.mean_px == 173) // constant image → exact mean, pixel-level proof
  }

  test("decodeImage reads non-constant pixel content, not just the header") {
    // 2×1 image, pixels 10 and 30 → mean over 6 samples = 20
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, (10 << 16) | (10 << 8) | 10)
    img.setRGB(1, 0, (30 << 16) | (30 << 8) | 30)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val m = Media.decodeImage(bos.toByteArray)
    assert(m.width == 2 && m.height == 1 && m.mean_px == 20)
  }

  test("corrupt bytes degrade to the unknown sentinel, never throw") {
    val png = Media.encodePng(8, 8, 42)
    // bare signature: PNG reader selected, pixel read fails
    assert(Media.decodeImage(png.take(8)).format == "unknown")
    // truncated mid-stream
    assert(Media.decodeImage(png.dropRight(png.length / 2)).format == "unknown")
    // not an image at all / empty / null
    assert(Media.decodeImage("not an image".getBytes).format == "unknown")
    assert(Media.decodeImage(Array.emptyByteArray).format == "unknown")
    assert(Media.decodeImage(null).format == "unknown")
    val c = Media.decodeImage(png.take(8))
    assert(c.width == -1 && c.height == -1 && c.n_channels == 0 && c.mean_px == -1)
  }

  test("decodeTable: corrupt rows degrade in place while the rest of the partition decodes") {
    val docs = Seq((10L, 40L), (11L, 40L), (12L, 77L))
      .toDF("doc_id", "n_chars")
    val out = Media.decodeTable(Media.syntheticMediaTable(docs))
      .orderBy("doc_id")
      .as[Media.MediaMeta].collect()
    assert(out(0) == Media.MediaMeta(10L, "unknown", -1, -1, 0, -1)) // 10 % 10 == 0
    assert(out(1) == Media.MediaMeta(11L, "png", 40 % 31 + 4, 11 % 17 + 4, 3, 11))
    assert(out(2) == Media.MediaMeta(12L, "png", 77 % 31 + 4, 12 % 17 + 4, 3, 12))
  }
}
