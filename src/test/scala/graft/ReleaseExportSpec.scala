package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.io.ReleaseExport

/** [[ReleaseExport]] — the sealed-release contract: a clean export
  * verifies, a single flipped byte is caught by name, a deleted shard
  * reports missing, a smuggled file reports extra, and the row count is
  * part of the seal. */
class ReleaseExportSpec extends SparkSuite {
  import spark.implicits._

  private def freshRelease(): String = {
    val dir = Files.createTempDirectory("rel").toString + "/release"
    val df = (0 until 5000).map(i => (i.toLong, s"row_$i")).toDF("id", "v").repartition(4)
    val (files, rows) = ReleaseExport.export(df, dir)
    assert(files == 4 && rows == 5000)
    dir
  }

  test("clean export verifies; re-export onto the same dir refuses") {
    val dir = freshRelease()
    val r = ReleaseExport.verify(spark, dir)
    assert(r.ok, r.toString)
    assert(r.filesChecked == 4)
    intercept[Exception](ReleaseExport.export(
      Seq((1L, "x")).toDF("id", "v"), dir))
  }

  test("a flipped byte, a deleted shard, and a smuggled file are all named") {
    val dir = freshRelease()
    val shards = Files.list(Paths.get(s"$dir/data")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
    // flip one byte mid-file
    val victim = Paths.get(shards.head)
    val bytes = Files.readAllBytes(victim)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x1).toByte
    Files.write(victim, bytes, StandardOpenOption.TRUNCATE_EXISTING)
    // drop Hadoop's local-FS CRC sidecar so the flip reaches the verifier
    // (object stores have no such sidecar; this is the realistic shape)
    Files.deleteIfExists(victim.resolveSibling(s".${victim.getFileName}.crc"))
    val r1 = ReleaseExport.verify(spark, dir)
    assert(!r1.ok && r1.corrupted == Seq(victim.getFileName.toString), r1.toString)
    // delete another shard -> missing (and the parquet row count breaks)
    Files.delete(Paths.get(shards.last))
    val r2 = ReleaseExport.verify(spark, dir)
    assert(r2.missing == Seq(Paths.get(shards.last).getFileName.toString), r2.toString)
    assert(!r2.rowCountOk)
    // smuggle an unmanifested parquet file -> extra
    Files.copy(victim, Paths.get(s"$dir/data/smuggled.parquet"))
    val r3 = ReleaseExport.verify(spark, dir)
    assert(r3.extra == Seq("smuggled.parquet"), r3.toString)
  }
}
