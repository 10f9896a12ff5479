package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.io.Sinks

/** Storage-layout levers for scale: bucketed shuffle-free joins and
  * partition-pruned reads, both asserted against the physical plan.
  */
class StorageSpec extends SparkSuite {

  test("bucketed tables join with zero shuffle exchanges") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Sinks.bucketedTable(li, "li_bucketed", Seq("l_orderkey"), 8)
    Sinks.bucketedTable(o, "o_bucketed", Seq("o_orderkey"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum("l_quantity"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(
        !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // row-level equality with the plain join
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      val bucketed = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey")).count()
      assert(bucketed == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("partitioned parquet reads prune to the filtered partitions") {
    val out = Files.createTempDirectory("part").toString + "/orders_by_year"
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("y", year(col("o_orderdate")))
    Sinks.parquet(o, out, partitionBy = Seq("y"))
    val read = spark.read.parquet(out).filter(col("y") === 1997)
    read.collect()
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("(y#") || plan.contains("y = 1997") || plan.contains("equals(y"),
      s"no partition filter:\n$plan")
    val expected = o.filter(col("y") === 1997).count()
    assert(read.count() == expected)
  }

  test("clusteredParquet writes disjoint per-file key ranges (stats-pruning layout)") {
    val out = Files.createTempDirectory("clus").toString + "/li_by_orderkey"
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Sinks.clusteredParquet(li, out, Seq("l_orderkey"), files = 4)
    val parts = new java.io.File(out).listFiles
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath)
    assert(parts.length == 4, s"expected 4 clustered files, got ${parts.length}")
    // every file covers a narrow range; ranges don't interleave — that's
    // what makes parquet min/max row-group stats selective on read
    val ranges = parts.map { p =>
      val r = spark.read.parquet(p)
        .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, prevHi), (nextLo, _)) =>
        assert(prevHi <= nextLo, s"overlapping file ranges: ${ranges.mkString(", ")}")
      case _ => ()
    }
    assert(spark.read.parquet(out).count() == li.count())
  }

  test("bloomFilteredParquet writes footer bloom filters and point lookups stay exact") {
    val out = Files.createTempDirectory("bloom").toString + "/docs"
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("digest", sha2(col("text"), 256)) // high-cardinality, unsorted
    Sinks.bloomFilteredParquet(docs, out, Seq("digest"), expectedNdv = 10000L)

    // Footer-level proof: the bloom filter actually exists for the column
    // (read through parquet-mr, the same API the scan's row-group skip uses).
    val part = new java.io.File(out).listFiles
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new Path(part.getAbsolutePath), conf))
    try {
      val rg = reader.getRowGroups.get(0)
      val digestCol = rg.getColumns.asScala
        .find(_.getPath.toDotString == "digest")
        .getOrElse(fail("digest column missing from row group"))
      assert(reader.getBloomFilterDataReader(rg).readBloomFilter(digestCol) != null,
        "no bloom filter written for digest")
      // An unprobed column must NOT pay the footer cost.
      val docIdCol = rg.getColumns.asScala.find(_.getPath.toDotString == "doc_id").get
      assert(reader.getBloomFilterDataReader(rg).readBloomFilter(docIdCol) == null,
        "bloom filter written for a column that never asked for one")
    } finally reader.close()

    // Point lookup through the filter stays exact (bloom skipping may drop
    // row groups, never rows).
    val probe = docs.select("digest").head().getString(0)
    val got = spark.read.parquet(out).filter(col("digest") === probe).count()
    val expected = docs.filter(col("digest") === probe).count()
    assert(got == expected && got >= 1)
  }

  test("compactParquet rewrites small-file sprawl into few files, rows intact") {
    val out = Files.createTempDirectory("compact").toString + "/li"
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    li.repartition(16).write.parquet(out) // simulate incremental-append sprawl
    def dataFiles() = new java.io.File(out).listFiles
      .filter(f => f.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(dataFiles().size == 16)
    val before = spark.read.parquet(out)
    val (nRows, qtySum) = (before.count(),
      before.agg(sum("l_quantity")).head().getDouble(0))
    val n = Sinks.compactParquet(spark, out, targetFileBytes = 1L << 30)
    assert(n == 1 && dataFiles().size == 1, s"expected 1 compacted file, got ${dataFiles().size}")
    val after = spark.read.parquet(out)
    assert(after.count() == nRows)
    assert(after.agg(sum("l_quantity")).head().getDouble(0) == qtySum)
    assert(!new java.io.File(out + "_compact_tmp").exists)
    assert(!new java.io.File(out + "_compact_old").exists)
  }

  test("deleteRows rewrites only the files containing the doomed keys") {
    val out = Files.createTempDirectory("del").toString + "/li"
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    // Clustered layout: each file owns a narrow key range, so a small key
    // set hits few files and the pruned affected-file scan stays small.
    Sinks.clusteredParquet(li, out, Seq("l_orderkey"), files = 8)
    val dir = new java.io.File(out)
    def snapshot() = dir.listFiles.filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap
    val before = snapshot()
    val total = li.count()
    val doomed = li.select("l_orderkey").distinct().orderBy("l_orderkey")
      .limit(2).collect().map(_.getLong(0)).toSeq
    val doomedRows = li.filter(col("l_orderkey").isin(doomed: _*)).count()

    val rewritten = Sinks.deleteRows(spark, out, "l_orderkey", doomed)
    val after = snapshot()
    // Adjacent smallest keys live in one clustered file: few rewrites.
    assert(rewritten >= 1 && rewritten <= 2, s"rewrote $rewritten files")
    val changed = after.keySet.filter(k => before.get(k) != after.get(k)) ++
      (before.keySet -- after.keySet)
    assert(changed.size == rewritten, s"untouched files changed: $changed")
    val remaining = spark.read.parquet(out)
    assert(remaining.count() == total - doomedRows)
    assert(remaining.filter(col("l_orderkey").isin(doomed: _*)).count() == 0)
  }

  test("shardedExport writes disjoint shards and a manifest that checks out") {
    val out = Files.createTempDirectory("shards").toString + "/docs"
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    Sinks.shardedExport(spark, docs, out, "doc_id", shards = 4)
    val manifestText = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out, "_manifest.json")), "UTF-8")
    // Parse via Spark's JSON reader (no JSON library in the test deps).
    import spark.implicits._
    val m = spark.read.json(Seq(manifestText).toDS())
    val head = m.head()
    assert(head.getAs[String]("key") == "doc_id")
    assert(head.getAs[Long]("shards") == 4)
    assert(head.getAs[Long]("total_rows") == docs.count())
    val files = m.select(explode(col("files")).as("f"))
      .select("f.file", "f.rows", "f.bytes", "f.min_key", "f.max_key")
      .collect()
    assert(files.length == 4)
    files.foreach { r =>
      val path = new java.io.File(out, r.getAs[String]("file"))
      assert(path.exists, s"manifest names missing file ${r.getAs[String]("file")}")
      assert(path.length == r.getAs[Long]("bytes"))
      assert(spark.read.parquet(path.getAbsolutePath).count() == r.getAs[Long]("rows"))
    }
    // Disjoint, reproducible key ranges (range clustering): sorted by
    // min_key, each shard's max stays below the next shard's min.
    val ranges = files.map(r =>
      (r.getAs[String]("min_key").toLong, r.getAs[String]("max_key").toLong)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, s"overlapping shards: ${ranges.toSeq}")
      case _ => ()
    }
  }

  test("dynamic partition pruning: dim-side filter prunes fact partitions at runtime") {
    // The 100 TB star-join workhorse: the fact table is partitioned on the
    // join key, the dim filter is NOT a literal on that key — so static
    // pruning can't fire and the fact partitions must be pruned at RUNTIME
    // from the dim side's broadcast (DynamicPruningExpression in the fact
    // scan's PartitionFilters).
    val base = Files.createTempDirectory("dpp").toString
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("y", year(col("o_orderdate")))
    Sinks.parquet(o, s"$base/fact", partitionBy = Seq("y"))
    val years = o.select("y").distinct().orderBy("y")
      .collect().map(_.getInt(0))
    val dim = spark.createDataFrame(
      years.map(y => (y, if (y == years.max) "current" else "old")).toSeq)
      .toDF("y", "era")
    Sinks.parquet(dim, s"$base/dim")
    val fact = spark.read.parquet(s"$base/fact")
    val dimT = spark.read.parquet(s"$base/dim").filter(col("era") === "current")
    val joined = fact.join(dimT, Seq("y")).groupBy("y").agg(sum("o_totalprice").as("rev"))
    val rows = joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in fact scan:\n$plan")
    // row equality vs the same join over the unpartitioned layout
    val expected = o.join(dimT, Seq("y")).groupBy("y").agg(sum("o_totalprice").as("rev"))
      .collect()
    assert(rows.map(_.toString).sorted.toSeq == expected.map(_.toString).sorted.toSeq)
    assert(rows.nonEmpty)
  }

  test("parquet footer aggregate pushdown: MIN/MAX/COUNT answered from statistics") {
    // The built-in companion to graft-media's listing-level aggregate
    // pushdown: with spark.sql.parquet.aggregatePushdown on, a bare
    // MIN/MAX/COUNT over a parquet table is answered from row-group
    // FOOTER statistics — the scan decodes no data pages at all. At
    // 100 TB that turns table-level accounting into metadata I/O.
    val prev = spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
    val prevV1 = spark.conf.getOption("spark.sql.sources.useV1SourceList")
    try {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      // footer-stat pushdown lives in the DSv2 parquet reader; parquet is
      // on the V1 list by default
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      val df = spark.read.parquet(s"$sf0001/orders.parquet")
        .agg(
          count(lit(1)).as("n"),
          min(col("o_orderkey")).as("lo"),
          max(col("o_orderkey")).as("hi"))
      val row = df.collect()(0)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"),
        s"aggregate not pushed to the parquet scan:\n$plan")
      // values must equal the normal read path
      val exp = spark.read.parquet(s"$sf0001/orders.parquet")
      assert(row.getLong(0) == exp.count())
      val mm = exp.agg(min(col("o_orderkey")), max(col("o_orderkey"))).collect()(0)
      assert(row.getLong(1) == mm.getLong(0) && row.getLong(2) == mm.getLong(1))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.parquet.aggregatePushdown", v)
        case None    => spark.conf.unset("spark.sql.parquet.aggregatePushdown")
      }
      prevV1 match {
        case Some(v) => spark.conf.set("spark.sql.sources.useV1SourceList", v)
        case None    => spark.conf.unset("spark.sql.sources.useV1SourceList")
      }
    }
  }
}
