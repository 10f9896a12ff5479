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
}
