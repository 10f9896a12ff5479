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
}
