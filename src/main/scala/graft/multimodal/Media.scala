package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2 L12): media as opaque binary
  * columns + typed metadata extracted by a per-partition decoder.
  *
  * The decode is REAL as of round 6 — for images AND audio.
  * [[decodeImage]] parses the binary payload with `javax.imageio`
  * (PNG/JPEG — the codecs shipped in the JDK), returning the decoded
  * dimensions, band count and the exact integer mean over all raster
  * samples; [[decodeWav]] is a hand-rolled RIFF/WAVE PCM parser
  * returning rate/channels/bits/sample count and the exact mean
  * |amplitude|. Undecodable bytes degrade to a sentinel row
  * (`format='unknown'`) instead of failing the batch — the behaviour
  * a 100 TB ingest needs when a corrupt object appears mid-partition.
  *
  * The container has no media dataset, so [[syntheticMediaTable]]
  * builds deterministic REAL PNG payloads from document columns
  * (constant-gray `doc_id % 256` image of `n_chars`-derived width and
  * `doc_id`-derived height; every 10th payload truncated to exercise
  * the degrade path). Because the pixel content is a pure function of
  * the row, the DuckDB oracle can state the decoded metadata in
  * closed form — a hash-exact check that the codec really recovered
  * what was encoded, not just that the plumbing ran.
  */
object Media {

  final case class MediaMeta(
      doc_id: Long, format: String, width: Long, height: Long,
      n_channels: Long, mean_px: Long)

  private val Corrupt = MediaMeta(0L, "unknown", -1L, -1L, 0L, -1L)

  private def constantGrayImage(width: Int, height: Int, gray: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val v = gray & 0xFF
    val rgb = (v << 16) | (v << 8) | v
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img
  }

  /** Deterministic real PNG: `width`×`height`, every pixel the gray
    * value `gray` (so the exact mean over all bands is `gray`). */
  def encodePng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(constantGrayImage(width, height, gray), "png", bos)
    bos.toByteArray
  }

  /** Deterministic real BMP (24-bit uncompressed — lossless, so the
    * same closed-form mean as PNG holds). */
  def encodeBmp(width: Int, height: Int, gray: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(constantGrayImage(width, height, gray), "bmp", bos)
    bos.toByteArray
  }

  /** Deterministic real JPEG at explicit compression quality 1.0.
    * JPEG is lossy in general, but a CONSTANT-COLOR image at q=1.0
    * round-trips exactly: R=G=B=v maps to Y=v, Cb=Cr=128 (the BT.601
    * coefficients sum to 1, so integer rounding is exact), every DCT
    * block is pure DC with zero AC, and the q=1.0 quantization tables
    * leave the DC coefficient untouched — decode reconstructs v at
    * every sample. MediaSpec sweeps the full synthetic parameter range
    * (every gray × the width/height extremes) to pin this exactness —
    * the closed-form oracle depends on it. */
  def encodeJpeg(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = constantGrayImage(width, height, gray)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Real image decode via `javax.imageio`: format name from the
    * registered reader, dimensions and band count from the decoded
    * raster, and the exact integer mean over every sample (floor
    * division — exact when the image is constant, a stable summary
    * otherwise). Any parse failure → the `unknown` sentinel. */
  def decodeImage(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length == 0) return Corrupt
    try {
      // explicit memory-backed stream: ImageIO.createImageInputStream
      // defaults to a DISK-cache stream (temp file create/write/delete
      // per payload — syscalls on the per-row ingest path, and an
      // outright failure on executors with a read-only tmpdir) for
      // bytes that are already in memory
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Corrupt
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
            val img = r.read(0)
            val raster = img.getRaster
            val (w, h, nb) = (img.getWidth, img.getHeight, raster.getNumBands)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                var b = 0
                while (b < nb) { sum += raster.getSample(x, y, b); b += 1 }
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h * nb
            MediaMeta(0L, fmt, w.toLong, h.toLong, nb.toLong,
              if (n > 0) sum / n else -1L)
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => Corrupt }
  }

  /** Test-scaffold media ingest: a (doc_id, media binary) table whose
    * payloads are real images deterministically derived from the row —
    * width `n_chars%31+4`, height `doc_id%17+4`, constant gray
    * `doc_id%256` — in a per-row MIX of formats (`doc_id%3` selects
    * PNG / JPEG(q=1.0) / BMP), so the driver query exercises every
    * ImageIO reader on real bytes, not just the PNG path (VERDICT r6
    * #6). Every 10th payload is truncated to its first 8 bytes, which
    * fails the decode — the corrupt-object path. */
  def syntheticMediaTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val (w, h, g) = ((nChars % 31 + 4).toInt, (id % 17 + 4).toInt, (id % 256).toInt)
          val img = (id % 3) match {
            case 0 => encodePng(w, h, g)
            case 1 => encodeJpeg(w, h, g)
            case _ => encodeBmp(w, h, g)
          }
          (id, if (id % 10 == 0) img.take(8) else img)
        }
      }
      .toDF("doc_id", "media")
  }

  final case class ResizeMeta(
      doc_id: Long, format: String, width: Long, height: Long,
      out_width: Long, out_height: Long, out_mean_px: Long)

  private val CorruptResize = ResizeMeta(0L, "unknown", -1L, -1L, -1L, -1L, -1L)

  /** Real box-average (area) resample over the decoded raster: output
    * sample (ox, oy, b) is the floor-mean of its source region
    * [⌊ox·w/outW⌋, ⌊(ox+1)·w/outW⌋) × [⌊oy·h/outH⌋, ⌊(oy+1)·h/outH⌋)
    * (clamped to ≥1 source pixel, so upscale degrades to
    * nearest-neighbor replication). Deterministic integer arithmetic —
    * no AWT rendering pipeline, no interpolation-hint variance — and a
    * constant image stays exactly constant at ANY target size, which is
    * what lets the driver oracle state the resized mean in closed form.
    * Single-band sources replicate their band across the 3-band output. */
  def boxResize(img: java.awt.image.BufferedImage, outW: Int, outH: Int): java.awt.image.BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val in = img.getRaster
    val nbIn = in.getNumBands
    val out = new java.awt.image.BufferedImage(
      outW, outH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val outR = out.getRaster
    var oy = 0
    while (oy < outH) {
      val y0 = oy * h / outH
      val y1 = math.max(y0 + 1, (oy + 1) * h / outH)
      var ox = 0
      while (ox < outW) {
        val x0 = ox * w / outW
        val x1 = math.max(x0 + 1, (ox + 1) * w / outW)
        var b = 0
        while (b < 3) {
          val bIn = math.min(b, nbIn - 1)
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += in.getSample(x, y, bIn); x += 1 }
            y += 1
          }
          outR.setSample(ox, oy, b, (sum / ((x1 - x0).toLong * (y1 - y0))).toInt)
          b += 1
        }
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Decode + [[boxResize]] + exact integer mean over the RESIZED
    * raster — the thumbnail/feature-prep transform of an image ingest,
    * with the same corrupt-object degrade contract as [[decodeImage]]
    * (same memory-backed reader pattern; see the notes there). */
  def resizeMeta(bytes: Array[Byte], outW: Int, outH: Int): ResizeMeta = {
    if (bytes == null || bytes.length == 0) return CorruptResize
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) CorruptResize
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
            val img = r.read(0)
            val res = boxResize(img, outW, outH)
            val raster = res.getRaster
            val nb = raster.getNumBands
            var sum = 0L
            var y = 0
            while (y < outH) {
              var x = 0
              while (x < outW) {
                var b = 0
                while (b < nb) { sum += raster.getSample(x, y, b); b += 1 }
                x += 1
              }
              y += 1
            }
            val n = outW.toLong * outH * nb
            ResizeMeta(0L, fmt, img.getWidth.toLong, img.getHeight.toLong,
              outW.toLong, outH.toLong, if (n > 0) sum / n else -1L)
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => CorruptResize }
  }

  final case class PerceptualSig(doc_id: Long, format: String, psig: String)

  private val CorruptSig = PerceptualSig(0L, "unknown", null)

  /** L71 signature half: the CANONICAL perceptual signature of an image
    * — decode, box-resample to a fixed `outW`×`outH`×3 raster (size and
    * aspect differences die here, exactly as a pHash pipeline's first
    * step), then md5 the pixel sequence rendered `"p0|p1|…"` in
    * row-major (y, then x) order with the 3 bands inner-most. Two
    * images get the same signature iff their canonical rasters are
    * pixel-identical — REGARDLESS of codec (a PNG and a BMP of the same
    * picture collide, which is the reason pipelines dedup on decoded
    * pixels, never on container bytes) and regardless of stored size.
    * The render is plain integers + '|' so any ANSI engine rebuilds the
    * digest bit-for-bit (the A14b md5 idiom, applied to pixels).
    * Corrupt payloads yield a NULL signature. */
  def perceptualSig(bytes: Array[Byte], outW: Int, outH: Int): PerceptualSig = {
    if (bytes == null || bytes.length == 0) return CorruptSig
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) CorruptSig
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
            val raster = boxResize(r.read(0), outW, outH).getRaster
            val sb = new java.lang.StringBuilder(outW * outH * 3 * 4)
            var y = 0
            while (y < outH) {
              var x = 0
              while (x < outW) {
                var b = 0
                while (b < 3) {
                  if (sb.length > 0) sb.append('|')
                  sb.append(raster.getSample(x, y, b))
                  b += 1
                }
                x += 1
              }
              y += 1
            }
            val md = java.security.MessageDigest.getInstance("MD5")
            val hex = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              .map(b => f"${b & 0xFF}%02x").mkString
            PerceptualSig(0L, fmt, hex)
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => CorruptSig }
  }

  /** Canonical perceptual signatures for a (doc_id, media) table. */
  def perceptualSigTable(media: DataFrame, outW: Int = 8, outH: Int = 8): DataFrame =
    decodedBy(media)((id, bytes) => Seq(perceptualSig(bytes, outW, outH).copy(doc_id = id)))

  /** L71: perceptual image dedup — exact-match grouping on the
    * canonical signature: per signature one keeper (min doc_id) and the
    * group size; corrupt payloads pass through as their own trivial
    * keepers (no signature → no dedup evidence). The group step is a
    * map-side-combinable aggregate on a 32-hex key (the L60 lesson —
    * never a content window), one shuffle end-to-end after the decode
    * scan. At 100 TB the same shape holds: signatures are
    * corpus-row-count keys, and a near-match (Hamming-ball) variant
    * would band-block the signature bits through the L4 SimHash
    * machinery rather than widen this exact group. */
  def perceptualDedup(media: DataFrame, outW: Int = 8, outH: Int = 8): DataFrame = {
    val sig = perceptualSigTable(media, outW, outH)
    val valid = sig.filter(col("psig").isNotNull)
    val groups = valid.groupBy("psig")
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("group_size"))
    val deduped = valid.join(groups, "psig")
      .select(col("doc_id"), col("format"), col("keeper"),
        (col("doc_id") === col("keeper")).as("kept"), col("group_size"))
    val corrupt = sig.filter(col("psig").isNull)
      .select(col("doc_id"), col("format"), col("doc_id").as("keeper"),
        lit(true).as("kept"), lit(1L).as("group_size"))
    deduped.unionByName(corrupt).orderBy("doc_id")
  }

  // ── L71b: perceptual NEAR-dup (Hamming-banded bit signatures) ──────

  /** Deterministic real 8×8 gradient image: pixel gray
    * g(x,y) = (base + 13·x + 29·y) mod 256, with an optional single
    * cell perturbed by +128 (mod 256) — the "same image, one corrupted
    * tile" near-duplicate shape. Lossless formats only (PNG/BMP): a
    * lossy codec would smear the closed-form raster the oracle
    * recomputes. */
  def encodeGradient(base: Int, flipCell: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val r = img.getRaster
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val g0 = (base + x * 13 + y * 29) % 256
        val g = if (y * 8 + x == flipCell) (g0 + 128) % 256 else g0
        var b = 0
        while (b < 3) { r.setSample(x, y, b, g); b += 1 }
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Test-scaffold gradient media: base pattern `(doc_id%128)·2`, every
    * 5th image perturbed at cell `doc_id%64` (the near-dup planted
    * pair: same base, ≤2 bits apart), PNG/BMP mix, every 10th payload
    * truncated (corrupt path) — [[syntheticMediaTable]]'s shape with
    * structure the BIT signature can see (a constant image thresholds
    * to all-zero bits, which would make near-dup vacuous). */
  def syntheticGradientTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val base = ((id % 128) * 2).toInt
          val flip = if (id % 5 == 0) (id % 64).toInt else -1
          val img = encodeGradient(base, flip, if (id % 2 == 0) "png" else "bmp")
          (id, if (id % 10 == 0) img.take(8) else img)
        }
      }
      .toDF("doc_id", "media")
  }

  final case class PerceptualBits(doc_id: Long, ok: Boolean, pbits: Long)

  /** The 64-bit fixed-threshold signature of an image: canonical
    * 8×8×3 box-resample, bit y·8+x set iff the cell's band-sum ≥ 384
    * (mid-gray ×3). A FIXED threshold (not the image mean) keeps every
    * bit a local property of its cell, so a single changed tile flips
    * exactly its own bit — which is what makes Hamming distance count
    * changed tiles, and what lets an ANSI oracle rebuild the bits from
    * a closed-form raster without modeling mean coupling. */
  def perceptualBits(bytes: Array[Byte]): PerceptualBits = {
    if (bytes == null || bytes.length == 0) return PerceptualBits(0L, ok = false, 0L)
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) PerceptualBits(0L, ok = false, 0L)
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val raster = boxResize(r.read(0), 8, 8).getRaster
            var bits = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val s = raster.getSample(x, y, 0) + raster.getSample(x, y, 1) +
                  raster.getSample(x, y, 2)
                if (s >= 384) bits |= (1L << (y * 8 + x))
                x += 1
              }
              y += 1
            }
            PerceptualBits(0L, ok = true, bits)
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => PerceptualBits(0L, ok = false, 0L) }
  }

  /** Bit signatures for a (doc_id, media) table. */
  def perceptualBitsTable(media: DataFrame): DataFrame =
    decodedBy(media)((id, bytes) => Seq(perceptualBits(bytes).copy(doc_id = id)))

  /** L71b: perceptual NEAR-dup pairs — images within `maxDist` Hamming
    * bits on the 64-bit signature, found without any all-pairs stage:
    * the signature splits into `bands` equal slices and candidate
    * pairs are generated ONLY inside equal-slice buckets. Pigeonhole
    * makes this EXACT, not approximate: d ≤ bands−1 differing bits
    * cannot touch every band, so every qualifying pair shares at least
    * one band bucket (requires maxDist < bands, enforced). Hot buckets
    * (a boilerplate image duplicated corpus-wide) are cut at
    * `maxBucket` members — the L2 maxDf tradeoff, documented loss:
    * pairs whose every shared band is hot are dropped. Scale shape:
    * decode scan → 4 band rows per image → bucket self-join →
    * distinct + one codegen'd xor/popcount verify; shuffle volume is
    * O(images·bands + candidate pairs), never O(n²). */
  def perceptualNearDupPairs(media: DataFrame, maxDist: Int = 3,
      bands: Int = 4, maxBucket: Int = 4096): DataFrame = {
    require(maxDist < bands, s"pigeonhole exactness needs maxDist < bands ($maxDist >= $bands)")
    require(64 % bands == 0, s"bands must divide 64 (got $bands)")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bits = perceptualBitsTable(media).filter(col("ok"))
      .select(col("doc_id"), col("pbits"))
    val banded = bits
      .select(col("doc_id"), col("pbits"),
        explode(sequence(lit(0), lit(bands - 1))).as("b"))
      .withColumn("bv", expr(s"shiftrightunsigned(pbits, b * $width)")
        .bitwiseAND(lit(mask)))
    val counts = banded.groupBy("b", "bv").agg(count(lit(1)).as("__n"))
    val cold = banded.join(counts.filter(col("__n") <= maxBucket), Seq("b", "bv"))
      .select(col("doc_id"), col("pbits"), col("b"), col("bv"))
    val cand = cold.as("x").join(cold.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.pbits").as("__pa"), col("y.pbits").as("__pb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("__pa").bitwiseXOR(col("__pb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy("a_id", "b_id")
  }

  /** Resize a (doc_id, media binary) table per partition (L12e). */
  def resizeTable(media: DataFrame, outW: Int = 8, outH: Int = 8): DataFrame =
    decodedBy(media)((id, bytes) => Seq(resizeMeta(bytes, outW, outH).copy(doc_id = id)))

  final case class PatchMeta(
      doc_id: Long, format: String, patch_row: Int, patch_col: Int,
      n_px: Long, mean_px: Long, var_px: Long)

  private val CorruptPatch = PatchMeta(0L, "unknown", -1, -1, -1L, -1L, -1L)

  /** ViT-style patch extraction (L12g): the decoded raster cut into a
    * `rows`×`cols` grid (the [[boxResize]] region geometry — every
    * pixel in exactly one patch, ≥1 source pixel per patch), each patch
    * emitting (row, col, n_px, mean, variance) — the patch-sequence
    * shape a vision transformer consumes, 1 image row → rows·cols
    * feature rows (L12b's fan-out contract, with grid identity instead
    * of frame index). Features are EXACT integers: mean = ⌊Σ/n⌋ and
    * var = ⌊(n·Σx² − (Σx)²)/n²⌋ over all bands, so a constant image
    * has every patch mean equal to its gray and variance exactly 0 —
    * the closed form the driver oracle states across all three real
    * codecs. Corrupt bytes degrade to one sentinel row. */
  def patchMeta(bytes: Array[Byte], rows: Int, cols: Int): Seq[PatchMeta] = {
    if (bytes == null || bytes.length == 0) return Seq(CorruptPatch)
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Seq(CorruptPatch)
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
            val img = r.read(0)
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            val nb = raster.getNumBands
            (0 until rows).flatMap { pr =>
              val y0 = pr * h / rows
              val y1 = math.max(y0 + 1, (pr + 1) * h / rows)
              (0 until cols).map { pc =>
                val x0 = pc * w / cols
                val x1 = math.max(x0 + 1, (pc + 1) * w / cols)
                var sum = 0L
                var sumSq = 0L
                var y = y0
                while (y < y1) {
                  var x = x0
                  while (x < x1) {
                    var b = 0
                    while (b < nb) {
                      val v = raster.getSample(x, y, b).toLong
                      sum += v; sumSq += v * v; b += 1
                    }
                    x += 1
                  }
                  y += 1
                }
                val n = (x1 - x0).toLong * (y1 - y0) * nb
                // exact-integer variance via BigInt: n*sumSq and
                // sum*sum exceed Long for ~8000×8000 3-band patches
                // (n≈1.2e7, sum≈3.1e9 → sum² > Long.Max — ADVICE r7);
                // one BigInt op per patch is noise next to the pixel loop
                val varNum = BigInt(n) * sumSq - BigInt(sum) * sum
                PatchMeta(0L, fmt, pr, pc, n, sum / n,
                  (varNum / (BigInt(n) * n)).toLong)
              }
            }
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => Seq(CorruptPatch) }
  }

  /** Patchify a (doc_id, media binary) table per partition (L12g). */
  def patchTable(media: DataFrame, rows: Int = 4, cols: Int = 4): DataFrame =
    decodedBy(media)((id, bytes) =>
      patchMeta(bytes, rows, cols).map(_.copy(doc_id = id)))

  final case class AudioMeta(
      doc_id: Long, format: String, sample_rate: Long, n_channels: Long,
      bits: Long, n_samples: Long, mean_abs: Long)

  private val CorruptAudio = AudioMeta(0L, "unknown", -1L, 0L, -1L, -1L, -1L)

  /** Deterministic real WAV: 16-bit PCM mono RIFF container, every
    * sample the constant `amp` (so mean |sample| is exactly |amp|). */
  def encodeWav(sampleRate: Int, nSamples: Int, amp: Short): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) { bb.putShort(amp); i += 1 }
    bb.array()
  }

  /** Real audio decode: a hand-rolled RIFF/WAVE parser (the format is
    * a 44-byte header + chunks — no library needed, and manual parsing
    * keeps the corrupt-bytes degrade explicit). Walks the chunk list
    * for `fmt ` and `data`, validates PCM, and computes the exact
    * integer mean of |sample| over the payload. Any malformed byte
    * stream → the `unknown` sentinel, never an exception. */
  def decodeWav(bytes: Array[Byte]): AudioMeta = {
    try {
      if (bytes == null || bytes.length < 44) return CorruptAudio
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val tag = new Array[Byte](4)
      bb.get(tag)
      if (new String(tag, "US-ASCII") != "RIFF") return CorruptAudio
      bb.getInt // declared riff length; chunk walk below re-validates
      bb.get(tag)
      if (new String(tag, "US-ASCII") != "WAVE") return CorruptAudio
      var rate = -1L; var channels = 0L; var bits = -1L
      var nSamples = -1L; var sumAbs = 0L
      var sawFmt = false; var sawData = false
      while (bb.remaining() >= 8 && !(sawFmt && sawData)) {
        bb.get(tag)
        val id = new String(tag, "US-ASCII")
        val len = bb.getInt
        if (len < 0 || len > bb.remaining()) return CorruptAudio
        val next = bb.position() + len
        id match {
          case "fmt " =>
            if (len < 16) return CorruptAudio
            val audioFormat = bb.getShort
            if (audioFormat != 1) return CorruptAudio // PCM only
            channels = bb.getShort.toLong
            rate = bb.getInt.toLong
            bb.getInt; bb.getShort // byte rate, block align
            bits = bb.getShort.toLong
            if (bits != 16 || channels < 1) return CorruptAudio
            sawFmt = true
          case "data" =>
            if (!sawFmt) return CorruptAudio // fmt must precede data in spec order
            nSamples = len / (channels * 2)
            var i = 0L
            val total = nSamples * channels
            while (i < total) { sumAbs += math.abs(bb.getShort.toLong); i += 1 }
            sawData = true
          case _ => // skip unknown chunk (LIST, fact, …)
        }
        bb.position(next + (len & 1)) // chunks are word-aligned
      }
      if (!sawFmt || !sawData) return CorruptAudio
      val total = nSamples * channels
      AudioMeta(0L, "wav", rate, channels, bits, nSamples,
        if (total > 0) sumAbs / total else -1L)
    } catch { case _: Exception => CorruptAudio }
  }

  final case class ResampleMeta(
      doc_id: Long, format: String, sample_rate: Long, n_samples: Long,
      out_rate: Long, out_samples: Long, out_mean_abs: Long)

  private val CorruptResample = ResampleMeta(0L, "unknown", -1L, -1L, -1L, -1L, -1L)

  /** Real PCM rate conversion (L12f, the audio twin of [[boxResize]]):
    * endpoint-aligned linear interpolation per channel in exact integer
    * arithmetic — out frame i reads source position i·(n−1)/(outN−1),
    * sample = s[idx] + (s[idx+1] − s[idx])·frac/denom with floor
    * division — so a constant-amplitude signal stays exactly constant
    * at ANY target rate (the closed-form-oracle lever, as with the
    * image resize) and the result is bit-deterministic. outN =
    * ⌊n·outRate/inRate⌋ (≥ 1 for non-empty input). Same degrade
    * contract as [[decodeWav]]. */
  def resampleWavMeta(bytes: Array[Byte], outRate: Int): ResampleMeta = {
    try {
      if (bytes == null || bytes.length < 44) return CorruptResample
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val tag = new Array[Byte](4)
      bb.get(tag)
      if (new String(tag, "US-ASCII") != "RIFF") return CorruptResample
      bb.getInt
      bb.get(tag)
      if (new String(tag, "US-ASCII") != "WAVE") return CorruptResample
      var rate = -1L; var channels = 0; var bits = -1L
      var samples: Array[Short] = null
      var sawFmt = false
      while (bb.remaining() >= 8 && samples == null) {
        bb.get(tag)
        val id = new String(tag, "US-ASCII")
        val len = bb.getInt
        if (len < 0 || len > bb.remaining()) return CorruptResample
        val next = bb.position() + len
        id match {
          case "fmt " =>
            if (len < 16) return CorruptResample
            if (bb.getShort != 1) return CorruptResample // PCM only
            channels = bb.getShort.toInt
            rate = bb.getInt.toLong
            bb.getInt; bb.getShort
            bits = bb.getShort.toLong
            if (bits != 16 || channels < 1) return CorruptResample
            sawFmt = true
          case "data" =>
            if (!sawFmt) return CorruptResample
            val total = len / 2
            samples = new Array[Short](total)
            var i = 0
            while (i < total) { samples(i) = bb.getShort; i += 1 }
          case _ =>
        }
        bb.position(next + (len & 1))
      }
      if (!sawFmt || samples == null) return CorruptResample
      val n = samples.length / channels
      if (n == 0) return ResampleMeta(0L, "wav", rate, 0L, outRate.toLong, 0L, -1L)
      val outN = math.max(1L, n.toLong * outRate / rate)
      var sumAbs = 0L
      var c = 0
      while (c < channels) {
        var i = 0L
        while (i < outN) {
          val v =
            if (outN == 1 || n == 1) samples(c).toLong
            else {
              val denom = outN - 1
              val posNum = i * (n - 1)
              val idx = (posNum / denom).toInt
              val frac = posNum % denom
              val s0 = samples(idx * channels + c).toLong
              val s1 = samples(math.min(idx + 1, n - 1) * channels + c).toLong
              s0 + (s1 - s0) * frac / denom
            }
          sumAbs += math.abs(v)
          i += 1
        }
        c += 1
      }
      val total = outN * channels
      ResampleMeta(0L, "wav", rate, n.toLong, outRate.toLong, outN, sumAbs / total)
    } catch { case _: Exception => CorruptResample }
  }

  /** Resample a (doc_id, media binary) audio table per partition. */
  def resampleAudioTable(media: DataFrame, outRate: Int = 16000): DataFrame =
    decodedBy(media)((id, bytes) => Seq(resampleWavMeta(bytes, outRate).copy(doc_id = id)))

  /** [[syntheticMediaTable]]'s audio twin: real deterministic WAVs —
    * sample rate `8000 + (doc_id%4)*4000`, `n_chars%500 + 50` samples,
    * constant amplitude `(doc_id*37) % 30000 - 15000`. Every 10th
    * payload truncated to its 12-byte RIFF/WAVE preamble — under the
    * 44-byte minimum, so the decoder rejects it up front: the
    * corrupt-object path. */
  def syntheticAudioTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val wav = encodeWav(
            (8000 + (id % 4) * 4000).toInt,
            (nChars % 500 + 50).toInt,
            ((id * 37) % 30000 - 15000).toShort)
          (id, if (id % 10 == 0) wav.take(12) else wav)
        }
      }
      .toDF("doc_id", "media")
  }

  final case class FrameMeta(
      doc_id: Long, frame_idx: Long, width: Long, height: Long, mean_px: Long)

  private val CorruptVideo = FrameMeta(0L, -1L, -1L, -1L, -1L)

  /** Deterministic real animated GIF: each frame a full constant-color
    * image (`grays(i)` in all three channels). The writer quantizes to
    * a palette; a constant frame's single color is preserved exactly,
    * so decode recovers the encoded gray bit-for-bit. */
  def encodeGif(width: Int, height: Int, grays: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      grays.foreach { g =>
        w.writeToSequence(
          new javax.imageio.IIOImage(constantGrayImage(width, height, g), null, null), null)
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Real multi-frame decode: every frame of an animated GIF container
    * (the one video-like format the JDK ships a codec for), one output
    * row per frame with the frame's dimensions and exact integer mean
    * over the RGB channels. Undecodable bytes → ONE sentinel row
    * (`frame_idx = -1`) so corrupt objects stay visible downstream. */
  def decodeFrames(bytes: Array[Byte]): Seq[FrameMeta] = {
    if (bytes == null || bytes.length == 0) return Seq(CorruptVideo)
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Seq(CorruptVideo)
        val r = readers.next()
        try {
          r.setInput(iis, false) // random access: getNumImages needs to search
          val n = r.getNumImages(true)
          if (n <= 0) return Seq(CorruptVideo)
          (0 until n).map { i =>
            val img = r.read(i)
            val (w, h) = (img.getWidth, img.getHeight)
            // bulk getRGB: one palette/ColorModel conversion pass into
            // an int array instead of a per-pixel virtual call
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var sum = 0L
            var j = 0
            while (j < px.length) {
              val rgb = px(j)
              sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
              j += 1
            }
            val cnt = w.toLong * h * 3
            FrameMeta(0L, i.toLong, w.toLong, h.toLong,
              if (cnt > 0) sum / cnt else -1L)
          }
        } finally r.dispose()
      } finally iis.close()
    } catch { case _: Exception => Seq(CorruptVideo) }
  }

  /** [[syntheticMediaTable]]'s video twin: real animated GIFs —
    * `doc_id%4 + 2` frames of `n_chars%21+4` × `doc_id%13+4`, frame i
    * constant gray `(doc_id + 41*i) % 256`. Every 10th payload
    * truncated to 10 bytes (a bare GIF89a header fragment) — the
    * corrupt-object path. */
  def syntheticVideoTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val gif = encodeGif(
            (nChars % 21 + 4).toInt, (id % 13 + 4).toInt,
            (0L until (id % 4 + 2)).map(i => ((id + 41 * i) % 256).toInt))
          (id, if (id % 10 == 0) gif.take(10) else gif)
        }
      }
      .toDF("doc_id", "media")
  }

  /** Frame-decode a (doc_id, media) table: the 1-row → n-frame-rows
    * flatMap shape with a REAL codec behind it. */
  def decodeVideoTable(media: DataFrame): DataFrame =
    decodedBy(media)((id, bytes) => decodeFrames(bytes).map(_.copy(doc_id = id)))

  /** Shared per-partition decode scaffold: every modality is the same
    * (doc_id, media) → rows plumbing around a different row decoder.
    * The mapPartitions scope is where a heavier codec would init once;
    * these codecs are stateless so the closure is the init. */
  private def decodedBy[T <: Product : scala.reflect.runtime.universe.TypeTag](
      media: DataFrame)(decode: (Long, Array[Byte]) => IterableOnce[T]): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[T] =
      org.apache.spark.sql.Encoders.product[T]
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) => decode(id, bytes) })
      .toDF()
  }

  /** [[decodeTable]]'s audio twin. */
  def decodeAudioTable(media: DataFrame): DataFrame =
    decodedBy(media)((id, bytes) => Seq(decodeWav(bytes).copy(doc_id = id)))

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

  /** Decode a (doc_id, media binary) table per partition. The
    * mapPartitions scope is where a heavier codec would init once; the
    * ImageIO readers are looked up per payload (cheap registry hit)
    * because format can vary row to row. */
  def decodeTable(media: DataFrame): DataFrame =
    decodedBy(media)((id, bytes) => Seq(decodeImage(bytes).copy(doc_id = id)))
}
