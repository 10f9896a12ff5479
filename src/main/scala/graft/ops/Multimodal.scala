package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.11 X5): media payloads travel
  * as opaque `binary` columns with typed metadata; decode/feature-extract
  * runs batch-wise in `mapPartitions` so a real decoder would amortize
  * per-partition setup (codec init, model load) across rows.
  *
  * The decode step itself is a STUB — this container ships no image/audio
  * codecs — replaced by a deterministic fake so the Spark-side plumbing
  * (schema, partitioning, batch shape) is real and testable end-to-end.
  */
object Multimodal {

  /** A media row: opaque payload + id. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte])

  /** Extracted features; in a real pipeline: dimensions, duration,
    * embedding, etc. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, checksum: Long)

  /** Build a binary-payload dataset from the documents table (treating the
    * UTF-8 text bytes as the opaque payload — stand-in for image bytes). */
  def fromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
  }

  /** Batch feature extraction over partitions. A real implementation
    * decodes the payload here; `decodeStub` fakes it deterministically. */
  def extractFeatures(spark: SparkSession, ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition setup for a real codec would go here (once, not per row)
      it.map(decodeStub)
    }
  }

  /** STUB decoder: deterministic fake "image" metadata derived from the
    * payload BYTES (the q37 oracle reproduces it per character code point,
    * which coincides only for ASCII payloads — the fixtures are ASCII; a
    * non-ASCII corpus needs a byte-level oracle or a code-point checksum). Replace with a real codec (`???`-equivalent) when the
    * runtime has one; signature and batch shape stay identical. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.media.length
    var checksum = 0L
    var i = 0
    while (i < n) { checksum = (checksum + (r.media(i) & 0xff)) % 997L; i += 1 }
    MediaFeatures(r.doc_id, n, n % 640, (n * 3) % 480, checksum)
  }

  // ---------------------------------------------------------------------
  // Real container handling (no external codec needed): WAV is a plain
  // RIFF byte layout, so the writer and the metadata parser below are
  // complete implementations, not stubs — the 100 TB pattern where the
  // cluster does container-level triage (validate, read params, slice)
  // and only surviving payloads reach an expensive decode stage.
  // ---------------------------------------------------------------------

  /** PCM parameters used by [[toWav]]; fixture payloads are wrapped as
    * 16 kHz mono 16-bit, the common speech-pipeline format. */
  val SampleRate = 16000
  val Channels = 1
  val BitsPerSample = 16

  final case class WavMeta(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      data_bytes: Int,
      n_samples: Int,
      duration_ms: Long)

  final case class FrameRow(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  /** Wrap an opaque payload as a canonical 44-byte-header RIFF/WAVE file,
    * padding to a whole 16-bit sample. Pure byte layout — a real writer. */
  def toWav(payload: Array[Byte]): Array[Byte] = {
    val data = if (payload.length % 2 == 0) payload else payload :+ 0.toByte
    val out = java.nio.ByteBuffer
      .allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = SampleRate * Channels * BitsPerSample / 8
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1.toShort) // PCM
    out.putShort(Channels.toShort)
    out.putInt(SampleRate)
    out.putInt(byteRate)
    out.putShort((Channels * BitsPerSample / 8).toShort) // block align
    out.putShort(BitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(data.length)
    out.put(data)
    out.array()
  }

  /** Parse the RIFF/WAVE header: validates all four magics and the PCM
    * format tag, reads the little-endian parameter fields. Returns None
    * for anything malformed (truncated, wrong magic, non-PCM) — the
    * triage filter drops those rows instead of failing the job. */
  def parseWav(docId: Long, media: Array[Byte]): Option[WavMeta] = {
    if (media.length < 44) return None
    val buf = java.nio.ByteBuffer.wrap(media).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def magic(at: Int, s: String): Boolean =
      new String(media, at, 4, "US-ASCII") == s
    if (!magic(0, "RIFF") || !magic(8, "WAVE") || !magic(12, "fmt ") || !magic(36, "data"))
      return None
    if (buf.getShort(20) != 1) return None // non-PCM
    val channels = buf.getShort(22).toInt
    val rate = buf.getInt(24)
    val bits = buf.getShort(34).toInt
    val dataBytes = buf.getInt(40)
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataBytes != media.length - 44) return None
    val nSamples = dataBytes / (channels * bits / 8)
    Some(WavMeta(docId, rate, channels, bits, dataBytes, nSamples,
      nSamples * 1000L / rate))
  }

  /** Documents → WAV-wrapped media (text bytes standing in for PCM). */
  def wavFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    fromDocuments(spark, documents).mapPartitions(_.map(r => MediaRecord(r.doc_id, toWav(r.media))))
  }

  /** Container-level metadata extraction — the real parser, batch-wise. */
  def wavMetadata(spark: SparkSession, ds: Dataset[MediaRecord]): Dataset[WavMeta] = {
    import spark.implicits._
    ds.mapPartitions(_.flatMap(r => parseWav(r.doc_id, r.media)))
  }

  /** Sample every `everyK`-th fixed-size frame of each WAV's data chunk
    * (video/audio frame sampling shape: slice, don't decode). Emits the
    * frame index, its byte length (tail frames are short), and a bytewise
    * checksum of the slice. Skips rows that fail the header parse. */
  def sampleFrames(
      spark: SparkSession, ds: Dataset[MediaRecord],
      frameBytes: Int, everyK: Int): Dataset[FrameRow] = {
    import spark.implicits._
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be positive")
    ds.mapPartitions(_.flatMap { r =>
      parseWav(r.doc_id, r.media).iterator.flatMap { meta =>
        val nFrames = (meta.data_bytes + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames, everyK).map { f =>
          val start = 44 + f * frameBytes
          val len = math.min(frameBytes, 44 + meta.data_bytes - start)
          var cs = 0L
          var i = start
          while (i < start + len) { cs = (cs + (r.media(i) & 0xff)) % 997L; i += 1 }
          FrameRow(r.doc_id, f, len, cs)
        }
      }
    })
  }
}
