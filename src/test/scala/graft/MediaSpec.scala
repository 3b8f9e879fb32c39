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

  test("JPEG(q=1.0) and BMP round-trip EXACTLY over the full synthetic parameter range") {
    // The multimodal_decode oracle states the decoded mean in closed
    // form for every format; lossless PNG/BMP make that trivially true,
    // but JPEG earns it only because constant-color + q=1.0 round-trips
    // exactly (see encodeJpeg). Sweep every gray value the synthetic
    // table can produce at the size extremes, and every size at a few
    // grays — if any (gray, w, h) drifted by ±1 the driver hash check
    // would fail, so pin it here first.
    for (g <- 0 until 256; (w, h) <- Seq((4, 4), (34, 20))) {
      val j = Media.decodeImage(Media.encodeJpeg(w, h, g))
      assert(j.format == "jpeg" && j.width == w && j.height == h &&
        j.n_channels == 3 && j.mean_px == g, s"jpeg drift at gray=$g ${w}x$h: $j")
      val b = Media.decodeImage(Media.encodeBmp(w, h, g))
      assert(b.format == "bmp" && b.width == w && b.height == h &&
        b.n_channels == 3 && b.mean_px == g, s"bmp drift at gray=$g ${w}x$h: $b")
    }
    for (w <- 4 to 34; h <- 4 to 20; g <- Seq(0, 101, 255)) {
      val j = Media.decodeImage(Media.encodeJpeg(w, h, g))
      assert(j.mean_px == g && j.width == w && j.height == h,
        s"jpeg drift at gray=$g ${w}x$h: $j")
    }
  }

  test("the synthetic media table mixes real formats per row and each decodes") {
    val docs = GraftSession.table(spark, SparkTestSession.sfDir, "documents")
    val decoded = Media.decodeTable(Media.syntheticMediaTable(docs))
      .select("doc_id", "format").as[(Long, String)].collect().toMap
    decoded.foreach { case (id, fmt) =>
      val expected = if (id % 10 == 0) "unknown"
        else if (id % 3 == 0) "png" else if (id % 3 == 1) "jpeg" else "bmp"
      assert(fmt == expected, s"doc $id: expected $expected, decoded $fmt")
    }
    assert(Set("png", "jpeg", "bmp", "unknown").subsetOf(decoded.values.toSet))
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

  test("decodeWav round-trips a real PCM WAV: rate, channels, bits, exact mean amplitude") {
    val m = Media.decodeWav(Media.encodeWav(16000, 250, 1234))
    assert(m.format == "wav")
    assert(m.sample_rate == 16000 && m.n_channels == 1 && m.bits == 16)
    assert(m.n_samples == 250)
    assert(m.mean_abs == 1234) // constant signal → exact mean, sample-level proof
    // negative amplitude: |mean| is over absolute sample values
    assert(Media.decodeWav(Media.encodeWav(8000, 50, -777)).mean_abs == 777)
  }

  test("decodeWav walks chunk lists and rejects malformed streams") {
    val wav = Media.encodeWav(8000, 100, 42)
    // an extra ignorable chunk between fmt and data still decodes: splice
    // a LIST chunk after byte 36 (end of fmt)
    val list = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII")).array()
    val spliced = wav.take(36) ++ list ++ wav.drop(36)
    // patch the RIFF length (bytes 4..7) for the inserted 12 bytes
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + 12)
    val m = Media.decodeWav(spliced)
    assert(m.format == "wav" && m.n_samples == 100 && m.mean_abs == 42)
    // corrupt shapes: truncation at various depths, wrong magic, garbage
    assert(Media.decodeWav(wav.take(12)).format == "unknown")
    assert(Media.decodeWav(wav.take(40)).format == "unknown")
    // a garbage DECLARED riff length is tolerated (the chunk walk
    // re-validates) — but a wrong WAVE magic is not
    assert(Media.decodeWav("RIFFnope".getBytes ++ wav.drop(8)).format == "wav")
    assert(Media.decodeWav(wav.take(8) ++ "EVAW".getBytes ++ wav.drop(12)).format == "unknown")
    assert(Media.decodeWav("definitely not audio".getBytes).format == "unknown")
    assert(Media.decodeWav(Array.emptyByteArray).format == "unknown")
    assert(Media.decodeWav(null).format == "unknown")
    // a data chunk whose declared length overruns the payload is rejected
    val overrun = wav.clone()
    java.nio.ByteBuffer.wrap(overrun).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue)
    assert(Media.decodeWav(overrun).format == "unknown")
  }

  test("decodeAudioTable: corrupt rows degrade in place while the rest decodes") {
    val docs = Seq((10L, 140L), (11L, 140L), (12L, 677L))
      .toDF("doc_id", "n_chars")
    val out = Media.decodeAudioTable(Media.syntheticAudioTable(docs))
      .orderBy("doc_id")
      .as[Media.AudioMeta].collect()
    assert(out(0) == Media.AudioMeta(10L, "unknown", -1, 0, -1, -1, -1))
    assert(out(1) == Media.AudioMeta(11L, "wav", 8000 + (11 % 4) * 4000, 1, 16,
      140 % 500 + 50, math.abs(11 * 37 % 30000 - 15000)))
    assert(out(2) == Media.AudioMeta(12L, "wav", 8000 + (12 % 4) * 4000, 1, 16,
      677 % 500 + 50, math.abs(12 * 37 % 30000 - 15000)))
  }

  test("decodeFrames round-trips a real animated GIF frame by frame") {
    val frames = Media.decodeFrames(Media.encodeGif(7, 5, Seq(10, 200, 99)))
    assert(frames.length == 3)
    frames.zip(Seq(10L, 200L, 99L)).zipWithIndex.foreach { case ((f, g), i) =>
      assert(f.frame_idx == i && f.width == 7 && f.height == 5 && f.mean_px == g,
        s"frame $i: $f")
    }
    // corrupt shapes → one sentinel row
    val gif = Media.encodeGif(4, 4, Seq(1, 2))
    assert(Media.decodeFrames(gif.take(10)) == Seq(Media.FrameMeta(0L, -1, -1, -1, -1)))
    assert(Media.decodeFrames("not video".getBytes).head.frame_idx == -1)
    assert(Media.decodeFrames(null).head.frame_idx == -1)
  }

  test("decodeVideoTable: per-row frame fan-out with corrupt sentinel rows") {
    val docs = Seq((10L, 25L), (11L, 25L)).toDF("doc_id", "n_chars")
    val out = Media.decodeVideoTable(Media.syntheticVideoTable(docs))
      .orderBy("doc_id", "frame_idx")
      .as[Media.FrameMeta].collect()
    assert(out.head == Media.FrameMeta(10L, -1, -1, -1, -1)) // corrupt
    val f11 = out.filter(_.doc_id == 11L)
    assert(f11.length == (11 % 4 + 2))
    f11.zipWithIndex.foreach { case (f, i) =>
      assert(f.width == 25 % 21 + 4 && f.height == 11 % 13 + 4)
      assert(f.mean_px == (11 + 41 * i) % 256)
    }
  }

  test("decodeTable: corrupt rows degrade in place while the rest of the partition decodes") {
    val docs = Seq((10L, 40L), (11L, 40L), (12L, 77L))
      .toDF("doc_id", "n_chars")
    val out = Media.decodeTable(Media.syntheticMediaTable(docs))
      .orderBy("doc_id")
      .as[Media.MediaMeta].collect()
    assert(out(0) == Media.MediaMeta(10L, "unknown", -1, -1, 0, -1)) // 10 % 10 == 0
    assert(out(1) == Media.MediaMeta(11L, "bmp", 40 % 31 + 4, 11 % 17 + 4, 3, 11)) // 11 % 3 == 2
    assert(out(2) == Media.MediaMeta(12L, "png", 77 % 31 + 4, 12 % 17 + 4, 3, 12)) // 12 % 3 == 0
  }

  // ── L12e: real box-average resize ────────────────────────────────────

  test("boxResize: constant images stay exactly constant at any target size, all formats") {
    for (enc <- Seq[(Int, Int, Int) => Array[Byte]](
           Media.encodePng, Media.encodeJpeg, Media.encodeBmp);
         (w, h) <- Seq((4, 4), (34, 20), (5, 17));
         (ow, oh) <- Seq((1, 1), (8, 8), (64, 3))) {
      val m = Media.resizeMeta(enc(w, h, 201), ow, oh)
      assert(m.width == w && m.height == h)
      assert(m.out_width == ow && m.out_height == oh)
      assert(m.out_mean_px == 201,
        s"resize $w×$h→$ow×$oh lost constancy: mean ${m.out_mean_px}")
    }
  }

  test("boxResize really averages regions (downscale) and replicates (upscale)") {
    // 2×1 image, pixels 10 and 30
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, (10 << 16) | (10 << 8) | 10)
    img.setRGB(1, 0, (30 << 16) | (30 << 8) | 30)
    // downscale to 1×1: floor mean (10+30)/2 = 20 in every band
    val down = Media.boxResize(img, 1, 1)
    assert((0 until 3).forall(b => down.getRaster.getSample(0, 0, b) == 20))
    // upscale to 4×1: each source pixel replicated twice
    val up = Media.boxResize(img, 4, 1)
    val row = (0 until 4).map(x => up.getRaster.getSample(x, 0, 0))
    assert(row == Seq(10, 10, 30, 30))
  }

  test("resampleWav: constant amplitude survives any rate exactly; ramps interpolate") {
    // constancy across up/down/identity conversions
    for ((inRate, n, amp) <- Seq((8000, 100, 1234), (16000, 373, -9000), (20000, 50, 0));
         outRate <- Seq(8000, 16000, 44100)) {
      val m = Media.resampleWavMeta(Media.encodeWav(inRate, n, amp.toShort), outRate)
      assert(m.format == "wav" && m.sample_rate == inRate && m.n_samples == n)
      assert(m.out_rate == outRate)
      assert(m.out_samples == math.max(1L, n.toLong * outRate / inRate))
      assert(m.out_mean_abs == math.abs(amp),
        s"$inRate->$outRate lost constancy: ${m.out_mean_abs} vs ${math.abs(amp)}")
    }
    // a 2-sample ramp [0, 1000] to 3 samples: endpoint-aligned midpoint
    val dataLen = 2 * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.putShort(0).putShort(1000)
    val m = Media.resampleWavMeta(bb.array(), 12000)
    // outN = 2*12000/8000 = 3 → samples [0, 500, 1000] → mean 500
    assert(m.out_samples == 3 && m.out_mean_abs == 500)
    // corrupt bytes degrade
    assert(Media.resampleWavMeta(Array[Byte](1, 2, 3), 16000).format == "unknown")
  }

  test("resizeTable: corrupt rows degrade in place while the rest resizes") {
    val docs = Seq((10L, 40L), (11L, 40L), (12L, 77L))
      .toDF("doc_id", "n_chars")
    val out = Media.resizeTable(Media.syntheticMediaTable(docs), 8, 8)
      .orderBy("doc_id")
      .as[Media.ResizeMeta].collect()
    assert(out(0) == Media.ResizeMeta(10L, "unknown", -1, -1, -1, -1, -1))
    assert(out(1) == Media.ResizeMeta(11L, "bmp", 40 % 31 + 4, 11 % 17 + 4, 8, 8, 11))
    assert(out(2) == Media.ResizeMeta(12L, "png", 77 % 31 + 4, 12 % 17 + 4, 8, 8, 12))
  }

  test("L12g patches: region means and variances on a crafted two-tone image; corrupt sentinel") {
    // 8×8 BMP, left 4 columns gray 0, right 4 columns gray 200
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = if (x < 4) 0 else 200
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val bytes = bos.toByteArray
    // 2×2 grid: each patch a pure tone — mean = tone, var = 0
    val grid = Media.patchMeta(bytes, 2, 2)
    assert(grid.map(p => (p.patch_row, p.patch_col, p.n_px, p.mean_px, p.var_px)) ==
      Seq((0, 0, 48L, 0L, 0L), (0, 1, 48L, 200L, 0L),
        (1, 0, 48L, 0L, 0L), (1, 1, 48L, 200L, 0L)))
    // 1×1 grid mixes the tones: mean = 100, var = E[x²] − mean² = 10000
    val whole = Media.patchMeta(bytes, 1, 1)
    assert(whole.map(p => (p.n_px, p.mean_px, p.var_px)) == Seq((192L, 100L, 10000L)))
    // corrupt bytes → one sentinel row
    assert(Media.patchMeta(Array[Byte](1, 2, 3), 4, 4) ==
      Seq(Media.PatchMeta(0L, "unknown", -1, -1, -1L, -1L, -1L)))
  }

  test("L71 perceptual signature: documented render order, cross-format and cross-size collisions") {
    def bytesOf(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    // 2×1 non-constant image, canonically resized to 2×1 (identity) —
    // render must be y-major, x inner, bands inner-most: "10|10|10|30|30|30"
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, (10 << 16) | (10 << 8) | 10)
    img.setRGB(1, 0, (30 << 16) | (30 << 8) | 30)
    val got = Media.perceptualSig(bytesOf(img, "png"), 2, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("10|10|10|30|30|30".getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString
    assert(got.psig == want, "canonical render order drifted")
    // same pixels in PNG and BMP collide; different pixels do not
    assert(Media.perceptualSig(bytesOf(img, "bmp"), 2, 1).psig == want)
    val other = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    other.setRGB(0, 0, (30 << 16) | (30 << 8) | 30)
    other.setRGB(1, 0, (10 << 16) | (10 << 8) | 10)
    assert(Media.perceptualSig(bytesOf(other, "png"), 2, 1).psig != want,
      "mirror image must not collide (order matters)")
    // cross-SIZE: the same constant gray at different stored sizes
    // canonicalizes to one signature
    val a = Media.perceptualSig(Media.encodePng(4, 6, 77), 8, 8)
    val b = Media.perceptualSig(Media.encodeBmp(10, 3, 77), 8, 8)
    assert(a.psig == b.psig && a.psig != null)
    assert(Media.perceptualSig(Media.encodePng(4, 6, 78), 8, 8).psig != a.psig)
    // corrupt bytes yield a NULL signature
    assert(Media.perceptualSig("not an image".getBytes("UTF-8"), 8, 8).psig == null)
  }

  test("L71 perceptual dedup: min-id keepers, corrupt passthrough") {
    import SparkTestSession.spark.implicits._
    val rows = Seq(
      (1L, Media.encodePng(4, 6, 50)),  // group A keeper
      (2L, Media.encodeBmp(9, 2, 50)),  // group A dup (other codec+size)
      (3L, Media.encodePng(5, 5, 60)),  // group B singleton
      (4L, "junk".getBytes("UTF-8")))   // corrupt passthrough
      .toDF("doc_id", "media")
    val got = Media.perceptualDedup(rows).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, 1L, true, 2L), (2L, 1L, false, 2L),
      (3L, 3L, true, 1L), (4L, 4L, true, 1L)))
  }

  test("L71b bits: gradient round-trips the closed-form signature across codecs") {
    def formulaBits(base: Int, flip: Int): Long = {
      var bits = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val g0 = (base + x * 13 + y * 29) % 256
        val g = if (y * 8 + x == flip) (g0 + 128) % 256 else g0
        if (g >= 128) bits |= (1L << (y * 8 + x))
      }
      bits
    }
    for (base <- Seq(0, 2, 100, 254); flip <- Seq(-1, 0, 37, 63); fmt <- Seq("png", "bmp")) {
      val got = Media.perceptualBits(Media.encodeGradient(base, flip, fmt))
      assert(got.ok && got.pbits == formulaBits(base, flip),
        s"bits diverged for base=$base flip=$flip fmt=$fmt")
    }
    // a flipped tile moves EXACTLY its own bit (the fixed-threshold point)
    assert(java.lang.Long.bitCount(formulaBits(10, -1) ^ formulaBits(10, 5)) == 1)
    assert(!Media.perceptualBits("junk".getBytes("UTF-8")).ok)
  }

  test("L71b banded near-dup pairs equal the naive quadratic truth") {
    import SparkTestSession.spark.implicits._
    // 40 docs on the driver-query formulas: bases repeat (docs 128 apart
    // collide), every 5th doc gets a planted tile flip
    val ids = (0L until 40L) ++ Seq(128L, 133L, 256L)
    val rows = ids.map { id =>
      val base = ((id % 128) * 2).toInt
      val flip = if (id % 5 == 0) (id % 64).toInt else -1
      val img = Media.encodeGradient(base, flip, if (id % 2 == 0) "png" else "bmp")
      (id, if (id % 10 == 0) img.take(8) else img)
    }.toDF("doc_id", "media")
    val got = Media.perceptualNearDupPairs(rows, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // naive truth from the same formulas, corrupt ids excluded
    def bits(id: Long): Long = {
      var b = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val g0 = (((id % 128) * 2).toInt + x * 13 + y * 29) % 256
        val g = if (id % 5 == 0 && y * 8 + x == id % 64) (g0 + 128) % 256 else g0
        if (g >= 128) b |= (1L << (y * 8 + x))
      }
      b
    }
    val valid = ids.filter(_ % 10 != 0)
    val want = (for {
      a <- valid; b <- valid if a < b
      d = java.lang.Long.bitCount(bits(a) ^ bits(b)) if d <= 3
    } yield (a, b, d)).sortBy(p => (p._1, p._2))
    assert(got == want, s"banded != naive: got ${got.size}, want ${want.size}")
    assert(want.nonEmpty, "vacuous fixture")
    // the planted same-base near-dup is present: 5 and 133 share base
    // 10, only doc 5 has a flipped tile → hamming exactly 1
    assert(got.contains((5L, 133L, 1)), s"planted near-dup missing: $got")
    // partition-invariant: banding + distinct + verify depend on no
    // shuffle arrival order
    val got7 = Media.perceptualNearDupPairs(rows.repartition(7), maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got7 == want)
    intercept[IllegalArgumentException] {
      Media.perceptualNearDupPairs(rows, maxDist = 4, bands = 4)
    }
  }
}
