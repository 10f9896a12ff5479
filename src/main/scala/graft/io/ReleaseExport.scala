package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-release packaging: parquet data plus a `RELEASE.json` sealing
  * every file's byte size and SHA-256 and the total row count — the
  * integrity artifact a downstream consumer checks before training
  * (q221's dataset card describes CONTENT; this seals BYTES, so silent
  * copy corruption or a swapped shard fails loudly instead of training
  * quietly wrong). Checksums are computed DISTRIBUTED via the binaryFile
  * source (one executor pass over the written shards, sha2 in codegen) —
  * the driver only assembles the file-count-sized manifest. [[verify]]
  * re-hashes the same way and reports every mismatch. */
object ReleaseExport {

  final case class Entry(name: String, bytes: Long, sha256: String)
  final case class Report(
      filesChecked: Int, missing: Seq[String], extra: Seq[String],
      corrupted: Seq[String], rowCountOk: Boolean) {
    def ok: Boolean =
      missing.isEmpty && extra.isEmpty && corrupted.isEmpty && rowCountOk
  }

  private def hashFiles(spark: SparkSession, dataDir: String): Seq[Entry] =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(dataDir)
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        col("length").as("bytes"),
        sha2(col("content"), 256).as("sha256"))
      .collect()
      .map(r => Entry(r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_.name)

  /** Write `df` under `dir/data` and seal it; returns (files, rows). */
  def export(df: DataFrame, dir: String): (Int, Long) = {
    val spark = df.sparkSession
    df.write.mode("errorifexists").parquet(s"$dir/data")
    val rows = spark.read.parquet(s"$dir/data").count()
    val entries = hashFiles(spark, s"$dir/data")
    val body =
      s"""{"rows":$rows,"n_files":${entries.size},"files":[""" +
        entries.map(e =>
          s"""{"name":"${e.name}","bytes":${e.bytes},"sha256":"${e.sha256}"}""")
          .mkString(",") + "]}"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$dir/RELEASE.json"), false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    (entries.size, rows)
  }

  /** Re-hash the release and compare against its manifest. */
  def verify(spark: SparkSession, dir: String): Report = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(s"$dir/RELEASE.json"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val declaredRows = "\"rows\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(text).map(_.group(1).toLong)
      .getOrElse(sys.error(s"malformed RELEASE.json at $dir"))
    val declared = """\{"name":"([^"]+)","bytes":(\d+),"sha256":"([0-9a-f]+)"\}""".r
      .findAllMatchIn(text)
      .map(m => Entry(m.group(1), m.group(2).toLong, m.group(3))).toSeq
    val actual = hashFiles(spark, s"$dir/data")
    val dm = declared.map(e => e.name -> e).toMap
    val am = actual.map(e => e.name -> e).toMap
    Report(
      filesChecked = actual.size,
      missing = declared.map(_.name).filterNot(am.contains).sorted,
      extra = actual.map(_.name).filterNot(dm.contains).sorted,
      corrupted = declared.collect {
        case e if am.get(e.name).exists(a => a.sha256 != e.sha256 || a.bytes != e.bytes) =>
          e.name
      }.sorted,
      // a corrupted/missing shard can make the parquet read itself throw;
      // that IS a failed row-count check, not a verifier crash
      rowCountOk =
        try spark.read.parquet(s"$dir/data").count() == declaredRows
        catch { case scala.util.control.NonFatal(_) => false })
  }
}
