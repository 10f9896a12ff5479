package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sinks (SURVEY.md §2.1 S4 + Parquet primary).
  *
  * `SingleFileCsvSink` reproduces the reference's single-file CSV contract
  * (`Cleaning.scala:155-178`, duplicated twice more there — implemented
  * once here): write via one task to a temp dir, then a driver-side Hadoop
  * FS rename of the `part-*` file. The `coalesce(1)` is inherently
  * single-task — a deliberate parity-only sink; the engine-native path is
  * partitioned Parquet.
  */
object Sinks {

  /** Partitioned Parquet — the engine's primary sink. Partition columns
    * become directory keys, enabling static + dynamic partition pruning on
    * read (the first-order scan reducer at 100 TB). */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed + sorted Parquet table (catalog-managed): co-locates rows by
    * key so equi-joins and aggregations between tables bucketed the same
    * way need NO shuffle — the second-order lever at 100 TB (pay one
    * shuffle at write time, amortize over every downstream join). Bucket
    * counts must match across join partners.
    */
  def bucketedTable(
      df: DataFrame, table: String, bucketCols: Seq[String], buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Range-clustered Parquet: `repartitionByRange` + `sortWithinPartitions`
    * on the cluster key, so each output file covers a narrow,
    * NON-OVERLAPPING key range and every row group's parquet min/max
    * footer stats are tight. Readers filtering on the key then skip whole
    * row groups (the parquet reader's stats pruning) — the third-order
    * scan reducer at 100 TB, for keys too high-cardinality to be
    * directory partitions (ids, timestamps). One range shuffle at write
    * time; `files` controls output granularity. */
  def clusteredParquet(
      df: DataFrame, path: String, clusterCols: Seq[String], files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(files, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Z-ordered Parquet: rows sorted along the Morton curve of TWO cluster
    * keys ([[graft.functions.InterleaveBits]]), so each output file covers
    * a small tile of (x, y) space and its min/max footer stats are tight
    * on BOTH columns — readers skip files/row groups for predicates on
    * either dimension. [[clusteredParquet]]'s single-key layout gives
    * tight stats on one column and useless stats on the other; use this
    * when two independent predicates both matter at scan time (e.g.
    * customer id AND order date over a 100 TB fact table). Keys must be
    * non-negative (see [[graft.functions.InterleaveBits]] domain note).
    * One range shuffle at write time; the z column never hits disk. */
  def zOrderedParquet(
      df: DataFrame, path: String, xCol: String, yCol: String, files: Int): Unit =
    zOrderedParquet(df, path, Seq(xCol, yCol), files)

  /** N-key variant ([[graft.functions.InterleaveBitsN]]): each output file
    * covers a small sub-volume of the N-dim key space, with the standard
    * trade — every added dimension coarsens per-dimension resolution
    * (⌊63/n⌋ interleaved bits each), so cluster on the 2-4 columns that
    * actually carry scan predicates. */
  def zOrderedParquet(
      df: DataFrame, path: String, clusterCols: Seq[String], files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val z = "__graft_z"
    // the file boundaries come from repartitionByRange's reservoir
    // sample; at the DEFAULT 100 rows/partition the z-range splits
    // wobble enough to smear tile edges across files (a thin slab then
    // touches an extra file or two). The write is the one place paying
    // for a denser sample is always right — scoped set/restore, the
    // ConnectedComponents checkpoint-dir pattern.
    val spark = df.sparkSession
    val key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val was = spark.conf.getOption(key)
    spark.conf.set(key, "2000")
    try df.withColumn(z, graft.functions.InterleaveBitsN.forFrame(df, clusterCols))
      .repartitionByRange(files, col(z))
      .sortWithinPartitions(z)
      .drop(z)
      .write.mode(SaveMode.Overwrite).parquet(path)
    finally was.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** Parquet with per-column BLOOM FILTERS in the footers: the point-lookup
    * lever for high-cardinality keys that are NOT the sort/cluster key —
    * min/max stats are useless on an unsorted column (every row group
    * spans the whole domain), but a footer bloom filter lets the reader
    * skip row groups that provably don't contain an equality-probed value
    * (needle-in-100TB id lookups, dedup-ledger membership probes).
    * `expectedNdv` sizes the filter per ROW GROUP (~128 MB of rows), not
    * per table — oversizing only costs footer bytes, undersizing costs
    * false positives (unnecessary reads, never wrong results). */
  def bloomFilteredParquet(
      df: DataFrame, path: String, bloomCols: Seq[String], expectedNdv: Long = 100000L): Unit =
    bloomCols.foldLeft(df.write.mode(SaveMode.Overwrite)) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }.parquet(path)

  /** Compact a parquet directory's small files into ~`targetFileBytes`
    * outputs. Small-file sprawl is the silent scan killer at 100 TB —
    * every file costs a listing call, a footer read, and a scheduler task,
    * so a partition that accreted 10k tiny files from incremental appends
    * scans orders of magnitude slower than the same bytes in ~128 MB
    * files. Rewrites via a temp dir + two renames (write never overlaps
    * the read); the swap is NOT atomic for concurrent readers — at scale
    * run it per partition directory during its quiet window, or under a
    * table format's commit protocol. Returns the new file count. */
  def compactParquet(
      spark: SparkSession, path: String, targetFileBytes: Long = 128L << 20): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val dir = new Path(path)
    val bytes = fs.listStatus(dir)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new Path(path + "_compact_tmp")
    val old = new Path(path + "_compact_old")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(dir, old)) sys.error(s"compact: could not move $dir aside")
    if (!fs.rename(tmp, dir)) { // restore the original on failure
      fs.rename(old, dir)
      sys.error(s"compact: could not move $tmp into place")
    }
    fs.delete(old, true)
    nFiles
  }

  /** Surgical row deletion from an immutable parquet layout: rewrite ONLY
    * the files that contain the doomed keys, leave every other file
    * byte-identical. The right-to-be-forgotten / bad-document purge
    * pattern at 100 TB — a naive `filter + overwrite` rewrites the whole
    * table to delete a handful of rows, while the affected-file scan here
    * rides whatever pruning the layout already provides (clustered
    * min/max, footer blooms for point keys), so cost scales with files
    * HIT, not table size. Per-file rewrite keeps the blast radius of a
    * failure to one file (the temp+rename from [[compactParquet]]'s
    * caveat applies: swap is not atomic for concurrent readers).
    * Returns the number of files rewritten. */
  def deleteRows(
      spark: SparkSession, path: String, keyCol: String, keys: Seq[Any]): Int = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    require(keys.nonEmpty, "deleteRows: empty key set")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(path), conf)
    // One pruned scan finds the affected files; the IN filter is pushed to
    // the parquet reader, so row groups whose stats/blooms exclude every
    // key are never decoded.
    val affected = spark.read.parquet(path)
      .filter(col(keyCol).isin(keys: _*))
      .select(input_file_name().as("f"))
      .distinct().collect().map(_.getString(0))
    affected.foreach { uri =>
      val file = new Path(new java.net.URI(uri))
      val tmpDir = new Path(file.getParent, s".${file.getName}.delete_tmp")
      spark.read.parquet(file.toString)
        .filter(!col(keyCol).isin(keys: _*))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(tmpDir.toString)
      val rewritten = fs.globStatus(new Path(tmpDir, "part-*.parquet"))
      require(rewritten.length <= 1, s"unexpected multi-part rewrite of $file")
      fs.delete(file, false)
      // A file whose every row matched is deleted outright (no empty file).
      rewritten.headOption.foreach(s => fs.rename(s.getPath, file))
      fs.delete(tmpDir, true)
    }
    affected.length
  }

  /** Training-shard export: range-cluster on `keyCol` into `shards` files
    * and write a `_manifest.json` recording, per shard, the file name, row
    * count, byte size, and the min/max key it covers. The manifest is
    * what downstream training loaders actually consume — resumable
    * delivery (re-pull one shard), deterministic ordering (shards are
    * disjoint key ranges, so shard i is reproducible), and integrity
    * checks (row/byte counts) without listing or reading the data files.
    * Counts come from one pass over the written files' footers/stats via
    * a grouped scan — no second full data read. */
  def shardedExport(
      spark: SparkSession, df: DataFrame, path: String, keyCol: String, shards: Int): Unit = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    clusteredParquet(df, path, Seq(keyCol), shards)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("rows"),
        min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"))
      .collect() // one row per shard — bounded by `shards`, not data size
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val sizes = fs.listStatus(new Path(path))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getLen).toMap
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val entries = perFile
      .map { r =>
        val name = new Path(new java.net.URI(r.getString(0))).getName
        (name, r.getLong(1), r.get(2), r.get(3))
      }
      .sortBy(_._1)
      .map { case (name, rows, lo, hi) =>
        s"""{"file":${jstr(name)},"rows":$rows,"bytes":${sizes(name)},""" +
          s""""min_key":${jstr(String.valueOf(lo))},"max_key":${jstr(String.valueOf(hi))}}"""
      }
    val manifest =
      s"""{"key":${jstr(keyCol)},"shards":${entries.length},""" +
        s""""total_rows":${perFile.map(_.getLong(1)).sum},"files":[${entries.mkString(",")}]}"""
    val out = fs.create(new Path(path, "_manifest.json"), true)
    try out.write(manifest.getBytes("UTF-8"))
    finally out.close()
  }

  /** Single headered CSV file at exactly `outPath` (ref S4). */
  def singleFileCsv(df: DataFrame, outPath: String)(implicit spark: SparkSession): Unit = {
    val tmp = outPath + "_tmp"
    df.coalesce(1)
      .write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(tmp), conf)
    val part = fs.globStatus(new Path(tmp, "part-*"))(0).getPath
    val out = new Path(outPath)
    if (fs.exists(out)) fs.delete(out, false)
    fs.rename(part, out)
    fs.delete(new Path(tmp), true)
  }
}
