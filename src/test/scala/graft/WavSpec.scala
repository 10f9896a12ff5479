package graft

import graft.ops.Multimodal

/** Real-container multimodal path: the WAV writer/parser are complete
  * implementations (byte layout, not codecs), so they get direct
  * byte-level tests beyond the q84/q85 oracle checks. */
class WavSpec extends SparkSuite {

  private val payload = "hello wav world".getBytes("US-ASCII") // 15 bytes, odd

  test("toWav/parseWav round-trip with odd-length padding") {
    val wav = Multimodal.toWav(payload)
    assert(wav.length == 44 + 16) // padded to a whole 16-bit sample
    val meta = Multimodal.parseWav(7L, wav).get
    assert(meta.sample_rate == 16000)
    assert(meta.channels == 1)
    assert(meta.bits_per_sample == 16)
    assert(meta.data_bytes == 16)
    assert(meta.n_samples == 8)
    assert(meta.duration_ms == 8 * 1000L / 16000)
  }

  test("parser rejects malformed containers instead of failing the job") {
    val wav = Multimodal.toWav(payload)
    assert(Multimodal.parseWav(1L, wav.take(30)).isEmpty, "truncated")
    val badMagic = wav.clone(); badMagic(0) = 'X'.toByte
    assert(Multimodal.parseWav(1L, badMagic).isEmpty, "bad RIFF magic")
    val nonPcm = wav.clone(); nonPcm(20) = 3.toByte
    assert(Multimodal.parseWav(1L, nonPcm).isEmpty, "non-PCM format tag")
    val lied = wav.clone(); lied(40) = (lied(40) + 1).toByte
    assert(Multimodal.parseWav(1L, lied).isEmpty, "data size != actual bytes")
  }

  test("audioFeatures folds int16 samples exactly; triage drops bad rows") {
    import spark.implicits._
    // "ab c": samples = [97+256*98, 32+256*99] = [25185, 25376]
    val good = Multimodal.MediaRecord(1L, Multimodal.toWav("ab c".getBytes("US-ASCII")))
    // odd length "abc": pad byte 0 -> samples = [25185, 99]
    val odd = Multimodal.MediaRecord(2L, Multimodal.toWav("abc".getBytes("US-ASCII")))
    val bad = Multimodal.MediaRecord(3L, Array[Byte](1, 2, 3)) // not a container
    val got = Multimodal.audioFeatures(spark, Seq(good, odd, bad).toDS())
      .collect().map(f => f.doc_id -> f).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L).n_samples == 2 && got(1L).peak == 25376)
    assert(got(1L).sum_s == 25185L + 25376L)
    assert(got(1L).sum_sq == 25185L * 25185L + 25376L * 25376L)
    assert(got(2L).n_samples == 2 && got(2L).peak == 25185 && got(2L).sum_s == 25185L + 99L)
  }

  test("frame sampling at k=1 covers every byte exactly once") {
    import spark.implicits._
    val wav = Multimodal.toWav(payload)
    val ds = Seq(Multimodal.MediaRecord(1L, wav)).toDS()
    val frames = Multimodal.sampleFrames(spark, ds, frameBytes = 4, everyK = 1)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == (0 until 4))
    assert(frames.map(_.n_bytes).sum == 16)
    val total = wav.drop(44).map(_ & 0xff).map(_.toLong).sum % 997L
    assert(frames.map(_.checksum).sum % 997L == total)
  }

  test("frame sampling skips unparseable rows") {
    import spark.implicits._
    val ds = Seq(
      Multimodal.MediaRecord(1L, Multimodal.toWav(payload)),
      Multimodal.MediaRecord(2L, Array[Byte](1, 2, 3))).toDS()
    val ids = Multimodal.sampleFrames(spark, ds, 100, 1).collect().map(_.doc_id).distinct
    assert(ids.toSeq == Seq(1L))
  }

  test("png/bmp writers round-trip through the header parsers") {
    val even = "abcdef".getBytes("US-ASCII") // length 6: even -> RGB
    val odd = "abcde".getBytes("US-ASCII") // length 5: odd -> RGBA
    val png = Multimodal.parsePng(1L, Multimodal.toPng(even)).get
    assert(png.format == "png" && png.width == 7 && png.height == 43)
    assert(png.bit_depth == 8 && png.channels == 3)
    val pngA = Multimodal.parsePng(2L, Multimodal.toPng(odd)).get
    assert(pngA.channels == 4)
    val bmp = Multimodal.parseBmp(3L, Multimodal.toBmp(even)).get
    assert(bmp.format == "bmp" && bmp.width == 7 && bmp.height == 43)
    assert(bmp.bit_depth == 8 && bmp.channels == 3)
  }

  test("image parsers reject malformed containers") {
    val png = Multimodal.toPng("hello world".getBytes("US-ASCII"))
    assert(Multimodal.parsePng(1L, png.take(20)).isEmpty, "truncated png")
    val badSig = png.clone(); badSig(0) = 'X'.toByte
    assert(Multimodal.parsePng(1L, badSig).isEmpty, "bad signature")
    val badCrc = png.clone(); badCrc(16) = (badCrc(16) + 1).toByte // corrupt width
    assert(Multimodal.parsePng(1L, badCrc).isEmpty, "IHDR CRC must catch corruption")
    val bmp = Multimodal.toBmp("hello world".getBytes("US-ASCII"))
    assert(Multimodal.parseBmp(1L, bmp.take(40)).isEmpty, "truncated bmp")
    val lied = bmp.clone(); lied(2) = (lied(2) + 1).toByte // file size field
    assert(Multimodal.parseBmp(1L, lied).isEmpty, "size mismatch")
    // cross-format sniffing: each parser refuses the other's container
    assert(Multimodal.parsePng(1L, bmp).isEmpty && Multimodal.parseBmp(1L, png).isEmpty)
  }

  test("mixed image corpus extracts metadata for every doc") {
    import spark.implicits._
    val docs = Seq((0L, "aaaa"), (1L, "bbbbb"), (2L, "cc")).toDF("doc_id", "text")
    val metas = Multimodal.imageMetadata(spark, Multimodal.imagesFromDocuments(spark, docs))
      .collect().sortBy(_.doc_id)
    assert(metas.map(m => (m.doc_id, m.format)).toSeq ==
      Seq((0L, "png"), (1L, "bmp"), (2L, "png")))
    assert(metas.forall(m => m.width >= 1 && m.height >= 1))
  }

  test("BMP nearest-neighbor resize: dims, padding, and exact pixel mapping") {
    val src = Multimodal.toBmpRaster(10, 6)
    val out = Multimodal.resizeBmpNearest(src, 5, 3).get
    val meta = Multimodal.parseBmp(99L, out).get
    assert(meta.width == 5 && meta.height == 3 && meta.channels == 3)
    // nearest mapping: dst (x,y) = src (x*10/5, y*6/3) = (2x, 2y); check
    // every pixel against the deterministic raster function, honoring the
    // 4-byte row padding of BOTH rasters (srcRow 32B -> dstRow 16B)
    for (y <- 0 until 3; x <- 0 until 5) {
      val (sx, sy) = (2 * x, 2 * y)
      val dst = 54 + y * 16 + 3 * x
      assert((out(dst) & 0xff) == ((sx * 7 + sy * 13) & 0xff), s"B mismatch at ($x,$y)")
      assert((out(dst + 1) & 0xff) == ((sx * 31 + sy) & 0xff), s"G mismatch at ($x,$y)")
      assert((out(dst + 2) & 0xff) == ((sx + sy * 57) & 0xff), s"R mismatch at ($x,$y)")
    }
    // upscale works too and round-trips the header parse
    val up = Multimodal.resizeBmpNearest(src, 20, 12).get
    assert(Multimodal.parseBmp(0L, up).get.width == 20)
    // non-raster BMPs (opaque payload pixel area) and PNGs triage out
    assert(Multimodal.resizeBmpNearest(Multimodal.toBmp("hello".getBytes), 2, 2).isEmpty)
    assert(Multimodal.resizeBmpNearest(Multimodal.toPng("hello".getBytes), 2, 2).isEmpty)
  }

  test("resizeImages triages a mixed corpus: rasters resized, rest dropped") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, Multimodal.toBmpRaster(8, 8)),
      Multimodal.MediaRecord(2L, Multimodal.toPng("x".getBytes)),
      Multimodal.MediaRecord(3L, Array[Byte](1, 2, 3))))
    val out = Multimodal.resizeImages(spark, ds, 4, 4).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L))
    val meta = Multimodal.parseBmp(1L, out.head.media).get
    assert(meta.width == 4 && meta.height == 4)
  }
}
