package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Codecs
import graft.multimodal.Codecs.{Raster, Wav, Y4m}

/** Pins the G-block's pure-JVM media parsers (round-11 verdict lead item):
  * decode∘encode identity, tolerance for the grammar each spec actually
  * allows (netpbm comments/whitespace, RIFF metadata chunks + pad bytes,
  * y4m frame parameters), and STRICTNESS on malformed payloads — a parser
  * that silently mis-slices bytes would poison every downstream gate.
  */
class CodecsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(13)

  // ---------------- netpbm ----------------

  test("PPM P6 round-trip: decode(encode(r)) == r, all byte values") {
    val px = Array.tabulate(5 * 4 * 3)(i => (i * 37 + 11) % 256)
    val r = Raster(5, 4, 3, 255, px)
    assert(Codecs.decodePpm(Codecs.encodePpm(r)) == r)
  }

  test("PGM P5 round-trip including 0 and 255 extremes") {
    val px = Array.tabulate(7 * 3)(i => if (i % 2 == 0) 0 else 255)
    val r = Raster(7, 3, 1, 255, px)
    assert(Codecs.decodePpm(Codecs.encodePpm(r)) == r)
  }

  test("netpbm parser honors comments and arbitrary whitespace in the header") {
    // hand-built header with the grammar the spec allows: comments between
    // any tokens, \r\n and tab runs as whitespace
    val px = Array(10, 20, 30, 40, 50, 60)
    val header = "P5 # magic comment\n# full-line comment\n\t3\r\n # w/h split\n 2 #d\n255\n"
    val bytes = header.getBytes("US-ASCII") ++ px.map(_.toByte)
    val r = Codecs.decodePpm(bytes)
    assert(r.width == 3 && r.height == 2 && r.channels == 1)
    assert(r.pixels.toSeq == px.toSeq)
  }

  test("netpbm parser rejects bad magic, truncated payloads, and maxval > 255") {
    val ok = Codecs.encodePpm(Raster(2, 2, 1, 255, Array(1, 2, 3, 4)))
    intercept[IllegalArgumentException](Codecs.decodePpm("P3\n2 2\n255\n".getBytes))
    intercept[IllegalArgumentException](Codecs.decodePpm(ok.dropRight(1)))
    intercept[IllegalArgumentException](
      Codecs.decodePpm("P5\n2 2\n65535\n".getBytes ++ Array.fill(8)(0.toByte)))
    intercept[IllegalArgumentException](Codecs.decodePpm(Array[Byte]('P'.toByte)))
  }

  // ---------------- WAV ----------------

  test("WAV 8-bit mono round-trip: header fields + every sample byte") {
    val data = Array.tabulate(300)(i => ((i * 7) % 256).toByte)
    val w = Wav(8000, 1, 8, data)
    val back = Codecs.decodeWav(Codecs.encodeWav(w))
    assert(back == w)
    assert(back.nSamples == 300 && back.sample(0) == 0 && back.sample(37) == (37 * 7) % 256)
  }

  test("WAV 16-bit round-trip preserves signed samples") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xFF).toByte; data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val back = Codecs.decodeWav(Codecs.encodeWav(Wav(44100, 1, 16, data)))
    assert(back.bitsPerSample == 16 && back.sampleRate == 44100)
    assert((0 until samples.length).map(back.sample).toSeq == samples.map(_.toInt).toSeq)
  }

  test("WAV 16-bit STEREO cross-codec: JDK AudioSystem reads our container, we read its") {
    // ours → AudioSystem: format fields and every sample byte must survive
    val data = new Array[Byte](400)
    (0 until 100).foreach { i =>
      val l = (i * 523 - 26000) % 32768; val r = (31000 - i * 617) % 32768
      data(4 * i) = (l & 0xFF).toByte; data(4 * i + 1) = ((l >> 8) & 0xFF).toByte
      data(4 * i + 2) = (r & 0xFF).toByte; data(4 * i + 3) = ((r >> 8) & 0xFF).toByte
    }
    val mine = Codecs.encodeWav(Wav(16000, 2, 16, data))
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(mine))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 16000f && fmt.getChannels == 2 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"AudioSystem parsed $fmt from our container")
    val theirs = ais.readAllBytes()
    assert(java.util.Arrays.equals(theirs, data),
      "AudioSystem read different sample bytes from our 16-bit stereo WAV")
    // AudioSystem → ours: decode the JDK writer's container
    val srcFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), srcFmt, 100),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val dec = Codecs.decodeWav(bos.toByteArray)
    assert(dec.sampleRate == 8000 && dec.channels == 2 && dec.bitsPerSample == 16,
      s"parsed ${dec.sampleRate}Hz ${dec.channels}ch ${dec.bitsPerSample}-bit")
    assert(java.util.Arrays.equals(dec.data, data),
      "we read different sample bytes from the AudioSystem WAV")
    // and the signed-sample accessor sign-extends (channel 0)
    assert(dec.sample(0) == ((data(1) << 8) | (data(0) & 0xFF)).toShort.toInt)
  }

  test("WAV chunk walk skips metadata chunks (odd-size pad rule) before data") {
    // canonical encode, then splice a 5-byte LIST chunk (odd → 1 pad byte)
    // between fmt and data — the 44-byte-offset assumption would mis-slice
    val base = Codecs.encodeWav(Wav(8000, 1, 8, Array[Byte](9, 8, 7, 6)))
    val (head, tail) = base.splitAt(36) // RIFF..fmt | data..
    val list = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      "INFOx".getBytes ++ Array[Byte](0) // payload 5 + pad 1
    val spliced = head ++ list ++ tail
    // fix the RIFF size field (chunk list grew by 14)
    spliced(4) = (spliced(4) + 14).toByte
    val w = Codecs.decodeWav(spliced)
    assert(w.data.toSeq == Seq[Byte](9, 8, 7, 6))
  }

  test("WAV parser rejects non-RIFF, non-PCM, and overrunning chunk sizes") {
    intercept[IllegalArgumentException](Codecs.decodeWav("RIFX....WAVE".getBytes))
    val ok = Codecs.encodeWav(Wav(8000, 1, 8, Array[Byte](1, 2)))
    val nonPcm = ok.clone(); nonPcm(20) = 3 // wFormatTag = IEEE float
    intercept[IllegalArgumentException](Codecs.decodeWav(nonPcm))
    val overrun = ok.clone(); overrun(40) = 99 // data size past the file end
    intercept[IllegalArgumentException](Codecs.decodeWav(overrun))
  }

  // ---------------- YUV4MPEG2 ----------------

  test("y4m mono round-trip: dims, frame count, every luma byte") {
    val frames = Array.tabulate(5)(f => Array.tabulate(6 * 4)(i => (f * 50 + i) % 256))
    val y = Y4m(6, 4, frames)
    assert(Codecs.decodeY4m(Codecs.encodeY4m(y)) == y)
  }

  test("y4m parser honors frame parameters and unknown header tags") {
    val body = Array.tabulate(4)(i => (i + 1) * 10)
    val bytes = "YUV4MPEG2 W2 H2 F30000:1001 Ip A1:1 Cmono XYSCSS=mono\n".getBytes ++
      "FRAME Ixyz\n".getBytes ++ body.map(_.toByte)
    val y = Codecs.decodeY4m(bytes)
    assert(y.width == 2 && y.height == 2 && y.frames.length == 1)
    assert(y.frames.head.toSeq == body.toSeq)
  }

  test("y4m 4:2:0 frame size math: w*h*3/2 bytes per frame") {
    val fb = 4 * 2 * 3 / 2
    val bytes = "YUV4MPEG2 W4 H2 F25:1\n".getBytes ++ // default C420
      "FRAME\n".getBytes ++ Array.tabulate(fb)(_.toByte) ++
      "FRAME\n".getBytes ++ Array.tabulate(fb)(i => (i + 100).toByte)
    val y = Codecs.decodeY4m(bytes)
    assert(y.frames.length == 2 && y.frames.forall(_.length == fb))
  }

  test("y4m parser rejects bad magic, missing dims, truncated frames") {
    intercept[IllegalArgumentException](Codecs.decodeY4m("YUV4MPEG1 W2 H2\n".getBytes))
    intercept[IllegalArgumentException](
      Codecs.decodeY4m("YUV4MPEG2 W2 Cmono\nFRAME\n....".getBytes))
    intercept[IllegalArgumentException](
      Codecs.decodeY4m("YUV4MPEG2 W2 H2 Cmono\nFRAME\nab".getBytes)) // 2 of 4 bytes
  }

  test("random fuzz: every format round-trips 50 random payloads") {
    (0 until 50).foreach { k =>
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(20)
      val ch = if (rnd.nextBoolean()) 1 else 3
      val r = Raster(w, h, ch, 255, Array.fill(w * h * ch)(rnd.nextInt(256)))
      assert(Codecs.decodePpm(Codecs.encodePpm(r)) == r, s"ppm fuzz $k")
      val wav = Wav(1 + rnd.nextInt(48000), 1, 8,
        Array.fill(rnd.nextInt(500))(rnd.nextInt(256).toByte))
      assert(Codecs.decodeWav(Codecs.encodeWav(wav)) == wav, s"wav fuzz $k")
      val y = Y4m(w, h, Array.fill(rnd.nextInt(6))(Array.fill(w * h)(rnd.nextInt(256))))
      assert(Codecs.decodeY4m(Codecs.encodeY4m(y)) == y, s"y4m fuzz $k")
      assert(Codecs.decodePng(Codecs.encodePng(r)) == r, s"png fuzz $k")
    }
  }

  test("PNG round-trip exercises ALL FIVE filter predictors (h >= 5 rows)") {
    // encoder cycles filter type row % 5, so any raster with >= 5 rows
    // forces None/Sub/Up/Average/Paeth through the decoder's unfilter
    val w = 7; val h = 11
    Seq(1, 3).foreach { ch =>
      val r = Raster(w, h, ch, 255,
        Array.tabulate(w * h * ch)(i => (i * 37 + 11) % 256))
      val png = Codecs.encodePng(r)
      // genuine container: signature + IHDR first chunk
      assert(png.take(4).map(_ & 0xFF).toSeq == Seq(0x89, 'P', 'N', 'G'))
      assert(new String(png.slice(12, 16), "US-ASCII") == "IHDR")
      assert(Codecs.decodePng(png) == r, s"png $ch-channel round-trip")
    }
  }

  test("PNG decode is a real inflate: IDAT is smaller than the raw scanlines") {
    // a compressible raster (constant rows) must actually shrink — pins
    // that the payload rides DEFLATE, not stored bytes
    val w = 64; val h = 64
    val r = Raster(w, h, 3, 255, Array.tabulate(w * h * 3)(i => (i / (w * 3)) % 256))
    val png = Codecs.encodePng(r)
    assert(png.length < w * h * 3 / 2, s"png ${png.length}B for ${w * h * 3}B raster")
    assert(Codecs.decodePng(png) == r)
  }

  test("JPEG DC-only round-trip is EXACT: block-constant rasters, extremes, huffman cats") {
    // 0 and 255 blocks adjacent force the largest DC diffs (category 11)
    val vals = Array(0, 255, 128, 1, 254, 127, 129, 64, 192, 33, 200, 7, 255, 0, 99, 250)
    val w = 32; val h = 32
    val px = Array.tabulate(w * h)(i => vals(((i / w) / 8) * 4 + ((i % w) / 8)))
    val r = Raster(w, h, 1, 255, px)
    val jp = Codecs.encodeJpegBlockConstant(r)
    assert((jp(0) & 0xFF) == 0xFF && (jp(1) & 0xFF) == 0xD8, "missing SOI")
    assert(Codecs.decodeJpeg(jp) == r, "DC-only round-trip not exact")
    // non-multiple-of-8 grid sizes and 1-block images
    val r2 = Raster(8, 8, 1, 255, Array.fill(64)(42))
    assert(Codecs.decodeJpeg(Codecs.encodeJpegBlockConstant(r2)) == r2)
  }

  test("JPEG fuzz: 100 random block-constant rasters round-trip exactly (stuffing paths)") {
    (0 until 100).foreach { k =>
      val bw = 1 + rnd.nextInt(5); val bh = 1 + rnd.nextInt(5)
      val vals = Array.fill(bw * bh)(rnd.nextInt(256))
      val px = Array.tabulate(bw * 8 * bh * 8)(i =>
        vals(((i / (bw * 8)) / 8) * bw + ((i % (bw * 8)) / 8)))
      val r = Raster(bw * 8, bh * 8, 1, 255, px)
      assert(Codecs.decodeJpeg(Codecs.encodeJpegBlockConstant(r)) == r, s"jpeg fuzz $k")
    }
  }

  test("JPEG decoder is REAL: decodes the JDK ImageIO encoder's non-constant output") {
    // a general baseline stream from an INDEPENDENT encoder (Annex-K
    // huffman tables, quality-scaled quant, non-zero AC coefficients);
    // our decode must match ImageIO's own decode within the +-1 the
    // T.81 conformance bound allows between IDCT implementations
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val v = (x * 7 + y * 13 + (x * y) % 31) % 256
        img.getRaster.setSample(x, y, 0, v)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.92f)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    val mine = Codecs.decodeJpeg(bytes)
    assert(mine.width == w && mine.height == h && mine.channels == 1)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val d = math.abs(mine.pixels(y * w + x) - ref.getRaster.getSample(x, y, 0))
        maxDiff = math.max(maxDiff, d)
      }
    }
    assert(maxDiff <= 1, s"decoders diverge by $maxDiff (>1) on an ImageIO stream")
  }

  test("COLOR JPEG: MCU-constant 4:2:0 and 4:4:4 round-trip to the deterministic ycc∘rgb image") {
    // per-MCU RGB, including channel extremes forcing big chroma DCs
    val rgbs = Array((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255),
      (0, 0, 0), (17, 200, 99), (128, 128, 128), (250, 10, 130))
    for ((sh, sv) <- Seq((2, 2), (1, 1), (2, 1))) {
      val mw = 8 * sh; val mh = 8 * sv
      val mX = 4; val mY = 2
      val w = mX * mw; val h = mY * mh
      val px = new Array[Int](w * h * 3)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val (r, g, b) = rgbs((y / mh) * mX + (x / mw))
          val o = (y * w + x) * 3
          px(o) = r; px(o + 1) = g; px(o + 2) = b
        }
      }
      val enc = Codecs.encodeJpegMcuConstantColor(Raster(w, h, 3, 255, px), sh, sv)
      val dec = Codecs.decodeJpeg(enc)
      assert(dec.width == w && dec.height == h && dec.channels == 3, s"dims $sh/$sv")
      // expected: DC-only blocks reconstruct the rounded YCbCr exactly,
      // so decoded RGB is exactly yccToRgb(rgbToYcc(rgb)) per MCU
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val (r, g, b) = rgbs((y / mh) * mX + (x / mw))
          val (yv, cb, cr) = Codecs.rgbToYcc(r, g, b)
          val (er, eg, eb) = Codecs.yccToRgb(yv, cb, cr)
          val o = (y * w + x) * 3
          assert((dec.pixels(o), dec.pixels(o + 1), dec.pixels(o + 2)) == ((er, eg, eb)),
            s"pixel ($x,$y) $sh/$sv: got ${(dec.pixels(o), dec.pixels(o + 1), dec.pixels(o + 2))}, want ${(er, eg, eb)}")
        }
      }
      // the round trip is within ±2 of the ORIGINAL rgb (two rounded
      // fixed-point transforms) — pins the transform pair is sane
      (0 until w * h * 3).foreach { i =>
        val mcu = ((i / 3) / w / mh) * mX + ((i / 3) % w) / mw
        val orig = rgbs(mcu).productIterator.toSeq(i % 3).asInstanceOf[Int]
        assert(math.abs(dec.pixels(i) - orig) <= 2, s"roundtrip drift at $i")
      }
    }
  }

  test("COLOR JPEG cross-decoder: ImageIO reads our 4:4:4 and 4:2:0 streams within the band") {
    val rgbs = Array((200, 30, 60), (10, 180, 220), (90, 90, 90), (255, 128, 0))
    def build(sh: Int, sv: Int): (Int, Int, Array[Byte], Codecs.Raster) = {
      val mw = 8 * sh; val mh = 8 * sv
      val w = 2 * mw; val h = 2 * mh
      val px = new Array[Int](w * h * 3)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val (r, g, b) = rgbs((y / mh) * 2 + (x / mw))
          val o = (y * w + x) * 3
          px(o) = r; px(o + 1) = g; px(o + 2) = b
        }
      }
      val enc = Codecs.encodeJpegMcuConstantColor(Raster(w, h, 3, 255, px), sh, sv)
      (w, h, enc, Codecs.decodeJpeg(enc))
    }
    // 4:4:4 — no upsampling ambiguity: whole frame within ±2 (IDCT + color
    // transform differences between independent decoders)
    val (w4, h4, enc4, mine4) = build(1, 1)
    val ref4 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc4))
    assert(ref4 != null && ref4.getWidth == w4 && ref4.getHeight == h4)
    (0 until h4).foreach { y =>
      (0 until w4).foreach { x =>
        val rgb = ref4.getRGB(x, y)
        val o = (y * w4 + x) * 3
        val d = math.max(math.abs(((rgb >> 16) & 0xFF) - mine4.pixels(o)),
          math.max(math.abs(((rgb >> 8) & 0xFF) - mine4.pixels(o + 1)),
            math.abs((rgb & 0xFF) - mine4.pixels(o + 2))))
        assert(d <= 2, s"4:4:4 ($x,$y) diverges by $d from ImageIO")
      }
    }
    // 4:2:0 — upsampling filters differ ONLY where neighboring chroma
    // samples differ, i.e. near MCU borders; compare MCU interiors
    val (w0, h0, enc0, mine0) = build(2, 2)
    val ref0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc0))
    assert(ref0 != null && ref0.getWidth == w0 && ref0.getHeight == h0)
    (0 until h0).foreach { y =>
      (0 until w0).foreach { x =>
        if (x % 16 >= 4 && x % 16 < 12 && y % 16 >= 4 && y % 16 < 12) {
          val rgb = ref0.getRGB(x, y)
          val o = (y * w0 + x) * 3
          val d = math.max(math.abs(((rgb >> 16) & 0xFF) - mine0.pixels(o)),
            math.max(math.abs(((rgb >> 8) & 0xFF) - mine0.pixels(o + 1)),
              math.abs((rgb & 0xFF) - mine0.pixels(o + 2))))
          assert(d <= 2, s"4:2:0 interior ($x,$y) diverges by $d from ImageIO")
        }
      }
    }
  }

  test("COLOR JPEG decoder is REAL: decodes the JDK ImageIO COLOR encoder's 4:2:0 output") {
    // grayscale CONTENT in a color container: R=G=B per pixel ⇒ the
    // chroma planes are constant 128, so the (unspecified-by-T.81)
    // upsampling filter choice cannot matter and the two decoders must
    // agree within the IDCT+color-transform band on REAL quant tables,
    // Annex-K huffman codes, and non-zero AC coefficients
    val w = 48; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val v = (x * 5 + y * 11 + (x * y) % 23) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.9f)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    val mine = Codecs.decodeJpeg(bytes)
    assert(mine.width == w && mine.height == h && mine.channels == 3,
      s"got ${mine.width}x${mine.height}x${mine.channels}")
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val rgb = ref.getRGB(x, y)
        val o = (y * w + x) * 3
        maxDiff = math.max(maxDiff, math.max(
          math.abs(((rgb >> 16) & 0xFF) - mine.pixels(o)), math.max(
            math.abs(((rgb >> 8) & 0xFF) - mine.pixels(o + 1)),
            math.abs((rgb & 0xFF) - mine.pixels(o + 2)))))
      }
    }
    assert(maxDiff <= 3, s"decoders diverge by $maxDiff (>3) on an ImageIO color stream")
  }

  test("COLOR JPEG parser rejects 2-component SOF and out-of-range sampling factors") {
    val r = Raster(16, 16, 3, 255, Array.fill(16 * 16 * 3)(99))
    val good = Codecs.encodeJpegMcuConstantColor(r, 1, 1)
    def sofAt(bb: Array[Byte]): Int = (0 until bb.length - 1).find(i =>
      (bb(i) & 0xFF) == 0xFF && (bb(i + 1) & 0xFF) == 0xC0).get
    // component count 2 (neither grayscale nor YCbCr)
    val twoComp = good.clone()
    twoComp(sofAt(twoComp) + 9) = 2
    intercept[IllegalArgumentException](Codecs.decodeJpeg(twoComp))
    // luma sampling factor 3x1
    val badSamp = good.clone()
    badSamp(sofAt(badSamp) + 11) = 0x31
    intercept[IllegalArgumentException](Codecs.decodeJpeg(badSamp))
    // non-MCU-constant encode rejected
    intercept[IllegalArgumentException](Codecs.encodeJpegMcuConstantColor(
      Raster(16, 16, 3, 255, Array.tabulate(16 * 16 * 3)(_ % 251)), 2, 2))
  }

  test("JPEG parser rejects bad SOI, progressive SOF, truncated scans, bad tables") {
    val r = Raster(8, 8, 1, 255, Array.fill(64)(9))
    val good = Codecs.encodeJpegBlockConstant(r)
    intercept[IllegalArgumentException](Codecs.decodeJpeg("JFIF".getBytes))
    // flip SOF0 (C0) to progressive SOF2 (C2)
    val prog = good.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    intercept[IllegalArgumentException](Codecs.decodeJpeg(prog))
    // truncate inside the entropy data
    intercept[IllegalArgumentException](
      Codecs.decodeJpeg(java.util.Arrays.copyOfRange(good, 0, good.length - 3)))
    // block-constant precondition is enforced on the encode side
    intercept[IllegalArgumentException](Codecs.encodeJpegBlockConstant(
      Raster(8, 8, 1, 255, Array.tabulate(64)(identity))))
  }

  test("PNG parser rejects bad signature, corrupt CRC, truncated IDAT, bad filter") {
    val r = Raster(4, 4, 3, 255, Array.tabulate(48)(_ % 256))
    val good = Codecs.encodePng(r)
    intercept[IllegalArgumentException](Codecs.decodePng("nope".getBytes))
    // flip one byte inside IHDR data: the chunk CRC must catch it
    val crcBad = good.clone(); crcBad(16) = (crcBad(16) ^ 0x01).toByte
    intercept[IllegalArgumentException](Codecs.decodePng(crcBad))
    // drop the IEND chunk: strict parse requires the terminator
    intercept[IllegalArgumentException](
      Codecs.decodePng(java.util.Arrays.copyOfRange(good, 0, good.length - 12)))
    // a filtered stream whose first byte is an illegal filter type (7):
    // rebuild a minimal PNG around it via the encoder's own chunk writer
    val raw = Codecs.encodePng(Raster(1, 1, 1, 255, Array(42)))
    // corrupt the deflated payload → inflate or length check must throw
    val idatBad = raw.clone()
    idatBad(raw.length - 13) = (idatBad(raw.length - 13) ^ 0x40).toByte
    intercept[Exception](Codecs.decodePng(idatBad))
  }

  test("PROGRESSIVE JPEG: decodes the JDK ImageIO progressive encoder within the band") {
    // ImageIO MODE_DEFAULT emits a real multi-scan progression (DC first +
    // refinement, banded AC scans with successive approximation, EOBRUN,
    // ZRL) — the full G.1.2 surface — over a non-constant image; our
    // decode must match ImageIO's own read of the same bytes within the
    // ±1 IDCT conformance band
    def roundTrip(w: Int, h: Int, gray: Boolean, q: Float): Unit = {
      // color uses LUMA-varying / chroma-uniform content (R=G=B): the
      // JDK renders subsampled chroma through libjpeg-style triangular
      // ("fancy") upsampling while we implement JFIF simple replication —
      // both conformant, divergent only when subsampled chroma VARIES.
      // Uniform chroma makes the pin upsample-filter-independent while
      // still driving the chroma scans (DC + AC table selection + EOBRUN
      // on the subsampled grid) with real entropy data; varying-chroma
      // coefficient correctness is pinned by the progressive==baseline
      // equality test below, whose MCU-constant construction is exact.
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val v = (x * 7 + y * 13 + (x * y) % 31) % 256
          if (gray) img.getRaster.setSample(x, y, 0, v)
          else img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(q)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      // really progressive: SOF2 present, SOF0 absent
      def hasMarker(mk: Int) = bytes.sliding(2).exists(s =>
        (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == mk)
      assert(hasMarker(0xC2) && !hasMarker(0xC0), "ImageIO did not write SOF2")
      val mine = Codecs.decodeJpeg(bytes)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(mine.width == w && mine.height == h)
      assert(mine.channels == (if (gray) 1 else 3))
      var maxDiff = 0
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          if (gray) {
            val d = math.abs(mine.pixels(y * w + x) - ref.getRaster.getSample(x, y, 0))
            maxDiff = math.max(maxDiff, d)
          } else {
            val rgb = ref.getRGB(x, y)
            val o = (y * w + x) * 3
            maxDiff = math.max(maxDiff, math.abs(mine.pixels(o) - ((rgb >> 16) & 0xFF)))
            maxDiff = math.max(maxDiff, math.abs(mine.pixels(o + 1) - ((rgb >> 8) & 0xFF)))
            maxDiff = math.max(maxDiff, math.abs(mine.pixels(o + 2) - (rgb & 0xFF)))
          }
        }
      }
      assert(maxDiff <= 2,
        s"progressive decode diverges by $maxDiff (${w}x$h gray=$gray q=$q)")
    }
    roundTrip(40, 24, gray = true, 0.92f)
    roundTrip(33, 17, gray = true, 0.5f)   // non-MCU-aligned dims
    roundTrip(48, 32, gray = false, 0.9f)  // color: subsampled chroma scans
    roundTrip(35, 21, gray = false, 0.75f)
  }

  test("PROGRESSIVE fixture == BASELINE fixture: identical decoded image, SOF2 container") {
    // the MCU-constant construction renders identically through the
    // five-scan progression (DC Al=1 + refinement + per-comp EOBn AC
    // scans) and the one-scan baseline — including negative/odd DCs,
    // whose ((dc>>1)<<1)|(dc&1) reassembly is what the refinement proves
    val rgbs = Array((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255),
      (0, 0, 0), (17, 200, 99), (128, 128, 128), (250, 10, 130))
    for ((sh, sv) <- Seq((1, 1), (2, 2), (2, 1))) {
      val mw = 8 * sh; val mh = 8 * sv
      val mX = 4; val mY = 2
      val w = mX * mw; val h = mY * mh
      val px = new Array[Int](w * h * 3)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val (r, g, b) = rgbs(((y / mh) * mX + x / mw) % rgbs.length)
          val o = (y * w + x) * 3
          px(o) = r; px(o + 1) = g; px(o + 2) = b
        }
      }
      val raster = Codecs.Raster(w, h, 3, 255, px)
      val prog = Codecs.encodeJpegProgressiveMcuConstantColor(raster, sh, sv)
      val base = Codecs.encodeJpegMcuConstantColor(raster, sh, sv)
      // really a different container: SOF2 vs SOF0
      def hasMarker(bs: Array[Byte], mk: Int) = bs.sliding(2).exists(s =>
        (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == mk)
      assert(hasMarker(prog, 0xC2) && !hasMarker(prog, 0xC0))
      val dp = Codecs.decodeJpeg(prog)
      val db = Codecs.decodeJpeg(base)
      assert(dp.width == w && dp.height == h && dp.channels == 3)
      assert(dp.pixels.toSeq == db.pixels.toSeq,
        s"progressive and baseline decodes diverge at ${sh}x$sv")
      // and the JDK reads our progressive stream to the same image — on
      // MCU INTERIORS when chroma is subsampled (the upsampling filter is
      // unspecified by T.81 and the JDK's triangular one mixes MCUs at
      // borders; same discipline as the baseline 4:2:0 pin above)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(prog))
      var maxDiff = 0
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val interior = (sh == 1 || (x % mw >= mw / 4 && x % mw < mw * 3 / 4)) &&
            (sv == 1 || (y % mh >= mh / 4 && y % mh < mh * 3 / 4))
          if (interior) {
            val rgb = ref.getRGB(x, y)
            val o = (y * w + x) * 3
            maxDiff = math.max(maxDiff, Seq(
              math.abs(dp.pixels(o) - ((rgb >> 16) & 0xFF)),
              math.abs(dp.pixels(o + 1) - ((rgb >> 8) & 0xFF)),
              math.abs(dp.pixels(o + 2) - (rgb & 0xFF))).max)
          }
        }
      }
      assert(maxDiff <= 2, s"ImageIO diverges by $maxDiff on our progressive ${sh}x$sv stream")
    }
  }

  test("µ-law table matches the JDK AudioSystem ULAW codec for ALL 256 bytes") {
    import javax.sound.sampled._
    val ulawBytes = Array.tabulate[Byte](256)(_.toByte)
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(ulawBytes),
      new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false),
      256)
    val pcm = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false),
      src)
    val out = pcm.readAllBytes()
    assert(out.length == 512)
    (0 until 256).foreach { b =>
      val jdk = ((out(2 * b) & 0xFF) | (out(2 * b + 1) << 8)).toShort.toInt
      assert(jdk == Codecs.MulawTable(b),
        s"byte $b: jdk $jdk vs table ${Codecs.MulawTable(b)}")
    }
  }

  test("µ-law WAV: container round-trip, fact validation, full-range expansion") {
    val data = Array.tabulate[Byte](256)(_.toByte)
    val wav = Codecs.encodeWavCoded(Codecs.CodedWav(8000, 7, 1, 1, 256, data))
    val dec = Codecs.decodeWavMulaw(wav)
    assert(dec.length == 256)
    assert(dec.min == -32124 && dec.max == 32124, "full µ-law range")
    // a lying fact chunk must be rejected (offset 20+fmtSize+8 = 46)
    val bad = wav.clone(); bad(46) = (bad(46) ^ 1).toByte
    intercept[Exception](Codecs.decodeWavMulaw(bad))
    // the PCM walk must refuse the compressed tag, and vice versa
    intercept[Exception](Codecs.decodeWav(wav))
    intercept[Exception](Codecs.decodeWavMulaw(
      Codecs.encodeWav(Codecs.Wav(8000, 1, 8, data))))
  }

  test("IMA ADPCM decode matches an independent from-the-tables simulation") {
    // an independent replay: same published tables, recurrence written
    // fresh here (catches a transcription slip in the shared adpcmStep)
    val steps = Codecs.AdpcmStepTable
    val it = Codecs.AdpcmIndexTable
    def sim(pred0: Int, idx0: Int, nibs: Seq[Int]): Seq[Int] = {
      var p = pred0; var ix = idx0
      pred0 +: nibs.map { n =>
        val st = steps(ix)
        var d = st / 8
        if ((n & 4) != 0) d += st
        if ((n & 2) != 0) d += st / 2
        if ((n & 1) != 0) d += st / 4
        p = math.max(-32768, math.min(32767, if ((n & 8) != 0) p - d else p + d))
        ix = math.max(0, math.min(88, ix + it(n)))
        p
      }
    }
    val rnd = new scala.util.Random(11)
    (0 until 20).foreach { _ =>
      val payload = Array.fill[Byte](10 * (1 + rnd.nextInt(5)))(rnd.nextInt(256).toByte)
      val wav = graft.plans.MediaCodecs.wavAdpcmFromBytes(payload, 8000)
      val dec = Codecs.decodeWavAdpcm(wav)
      val want = (0 until payload.length / 10).flatMap { b =>
        val pred0 = ((payload(10 * b) & 0xFF) - 128) * 256
        val idx0 = (payload(10 * b + 1) & 0xFF) % 89
        val nibs = (2 until 10).flatMap { k =>
          val x = payload(10 * b + k) & 0xFF
          Seq(x & 0xF, (x >> 4) & 0xF)
        }
        sim(pred0, idx0, nibs)
      }
      assert(dec.toSeq == want, "decode diverges from the independent simulation")
    }
    // clamping is reachable: a max-step block driven upward must pin at 32767
    val hot = Array[Byte](-1, 88.toByte, 0x77, 0x77, 0x77, 0x77, 0x77, 0x77, 0x77, 0x77)
    val hotDec = Codecs.decodeWavAdpcm(graft.plans.MediaCodecs.wavAdpcmFromBytes(hot, 8000))
    assert(hotDec.contains(32767), "positive clamp never engaged")
    // a corrupted step index (>88) must be rejected by the block decoder
    val wav = graft.plans.MediaCodecs.wavAdpcmFromBytes(hot, 8000)
    val dataAt = wav.length - 12 * 1 + 2 // header idx byte of the only block
    val bad = wav.clone(); bad(dataAt) = 120.toByte
    intercept[Exception](Codecs.decodeWavAdpcm(bad))
  }
}
