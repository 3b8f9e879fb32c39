package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.multimodal.Media

/** ScalaCheck properties for the media codecs: every encoder/decoder
  * pair round-trips exactly over its whole parameter space, and the
  * decoders never throw on arbitrary byte garbage — the two contracts
  * the closed-form oracles and the 100 TB degrade path rest on. */
object MediaProps extends Properties("Media") {

  property("PNG round-trip: dims and exact constant mean") =
    Prop.forAll(Gen.choose(1, 48), Gen.choose(1, 48), Gen.choose(0, 255)) { (w, h, g) =>
      val m = Media.decodeImage(Media.encodePng(w, h, g))
      m.format == "png" && m.width == w && m.height == h &&
        m.n_channels == 3 && m.mean_px == g
    }

  property("BMP round-trip: dims and exact constant mean") =
    Prop.forAll(Gen.choose(1, 48), Gen.choose(1, 48), Gen.choose(0, 255)) { (w, h, g) =>
      val m = Media.decodeImage(Media.encodeBmp(w, h, g))
      m.format == "bmp" && m.width == w && m.height == h &&
        m.n_channels == 3 && m.mean_px == g
    }

  property("JPEG(q=1.0) round-trip: constant-color images decode EXACTLY") =
    Prop.forAll(Gen.choose(1, 48), Gen.choose(1, 48), Gen.choose(0, 255)) { (w, h, g) =>
      // lossy in general, exact for constant color at quality 1.0 (pure
      // DC blocks + unit quant tables) — the property the closed-form
      // multimodal oracle rests on, over ARBITRARY sizes, not just the
      // synthetic table's range
      val m = Media.decodeImage(Media.encodeJpeg(w, h, g))
      m.format == "jpeg" && m.width == w && m.height == h &&
        m.n_channels == 3 && m.mean_px == g
    }

  property("boxResize keeps constant images exactly constant at ANY target size, all codecs") =
    Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 40), Gen.choose(0, 255),
      Gen.choose(1, 24), Gen.choose(1, 24), Gen.choose(0, 2)) { (w, h, g, ow, oh, fmt) =>
      val enc = fmt match {
        case 0 => Media.encodePng _
        case 1 => Media.encodeJpeg _
        case _ => Media.encodeBmp _
      }
      val m = Media.resizeMeta(enc(w, h, g), ow, oh)
      m.width == w && m.height == h && m.out_width == ow &&
        m.out_height == oh && m.out_mean_px == g
    }

  property("boxResize covers every source pixel exactly once on downscale") =
    Prop.forAll(Gen.choose(1, 30), Gen.choose(1, 30)) { (w, h) =>
      // gradient image; any partition-of-source property: the sum of
      // (region mean × region area) over output pixels = source sum when
      // regions tile the source exactly — checked here for ow=oh=1
      // (single region: floor mean over everything)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 7 + y * 13) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        sum += v
      }
      val out = Media.boxResize(img, 1, 1)
      (0 until 3).forall(b => out.getRaster.getSample(0, 0, b) == (sum / (w.toLong * h)).toInt)
    }

  property("WAV round-trip: rate, samples and exact |mean|") =
    Prop.forAll(
      Gen.choose(1, 192000), Gen.choose(0, 2000),
      Gen.choose(Short.MinValue + 1, Short.MaxValue.toInt)) { (rate, n, amp) =>
      val m = Media.decodeWav(Media.encodeWav(rate, n, amp.toShort))
      m.format == "wav" && m.sample_rate == rate && m.n_channels == 1 &&
        m.bits == 16 && m.n_samples == n &&
        m.mean_abs == (if (n > 0) math.abs(amp).toLong else -1L)
    }

  property("GIF round-trip: every frame's dims and constant gray") =
    Prop.forAll(
      Gen.choose(1, 24), Gen.choose(1, 24),
      Gen.nonEmptyListOf(Gen.choose(0, 255)).map(_.take(6))) { (w, h, grays) =>
      val frames = Media.decodeFrames(Media.encodeGif(w, h, grays))
      frames.length == grays.length && frames.zip(grays).zipWithIndex.forall {
        case ((f, g), i) =>
          f.frame_idx == i && f.width == w && f.height == h && f.mean_px == g
      }
    }

  private val garbage: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  property("decoders never throw on arbitrary bytes") =
    Prop.forAll(garbage) { bytes =>
      // sentinel or a successful parse — anything but an exception
      Media.decodeImage(bytes) != null &&
        Media.decodeWav(bytes) != null &&
        Media.decodeFrames(bytes).nonEmpty
    }

  property("truncations of valid payloads never throw") =
    Prop.forAll(Gen.choose(0, 120)) { cut =>
      val png = Media.encodePng(9, 7, 13)
      val wav = Media.encodeWav(8000, 40, 99)
      val gif = Media.encodeGif(5, 5, Seq(1, 2))
      Media.decodeImage(png.take(cut)) != null &&
        Media.decodeWav(wav.take(cut)) != null &&
        Media.decodeFrames(gif.take(cut)).nonEmpty
    }
}
