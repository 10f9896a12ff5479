package graft.sources

import org.apache.spark.sql.SparkSession

import graft.ops.Multimodal

/** Materializes the documents table as a directory of media container
  * files (`<doc_id>.png` for even ids / `.bmp` for odd — same corpus as
  * [[Multimodal.imagesFromDocuments]]) so [[MediaDataSource]] has a real
  * on-storage corpus to scan. Idempotent per fixture dir; the write goes
  * through the source's own DSv2 write path (executor-side, local shared
  * fs here — on a cluster the same code writes to shared storage). */
object MediaFixture {

  /** Returns the media dir for `sfDir`, writing it on first use. */
  def ensure(spark: SparkSession, sfDir: String): String = {
    val dirBytes = sfDir.getBytes("UTF-8")
    val key = java.lang.Long.toHexString(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        dirBytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        dirBytes.length, 42L))
    val dir = s"${sys.props("java.io.tmpdir")}/graft_media_$key"
    val docs = graft.core.Tables.documents(spark, sfDir)
    val expected = docs.count()
    if (MediaTable.listFiles(dir).size == expected) return dir
    // the source's own write path: format sniffed per row, overwrite
    // truncates any stale partial fixture
    Multimodal.imagesFromDocuments(spark, docs).toDF()
      .write.format("graft-media").mode("overwrite").save(dir)
    dir
  }
}
