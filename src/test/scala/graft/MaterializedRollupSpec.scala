package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.ops.MaterializedRollup

/** Incremental maintenance contract: merging any batching of the data
  * equals the one-shot aggregate (decomposable state vector), the refresh
  * is replay-proof under (writer, batch) txns, and state size is one row
  * per group. */
class MaterializedRollupSpec extends SparkSuite {
  import spark.implicits._

  private val groupCols = Seq("k")

  private def fixture: DataFrame =
    (1 to 300).map { i => (s"g${i % 7}", i.toDouble, (i % 41).toLong) }
      .toDF("k", "v", "u")

  private def direct(df: DataFrame): Seq[(String, Long, Double, Double, Double)] =
    df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("k")
      .as[(String, Long, Double, Double, Double)].collect().toSeq

  private def finalizedRows(path: String): Seq[(String, Long, Double, Double, Double)] =
    MaterializedRollup.read(spark, path, groupCols)
      .select(col("k"), col("n_rows"), col("sum_v"), col("min_v"), col("max_v"))
      .orderBy("k")
      .as[(String, Long, Double, Double, Double)].collect().toSeq

  test("k uneven increments merge to exactly the one-shot aggregate; one state row per group") {
    val path = Files.createTempDirectory("mroll").toString + "/t"
    val all = fixture.cache()
    // three deliberately uneven, non-aligned increments
    val batches = Seq(
      all.filter(col("v") <= 20), all.filter(col("v") > 20 && col("v") <= 201),
      all.filter(col("v") > 201))
    batches.foreach(b => MaterializedRollup.refresh(spark, path, b, groupCols, "v", "u"))
    assert(finalizedRows(path) == direct(all))
    // NDV sketch merged across increments == direct whole-data sketch
    val mergedNdv = MaterializedRollup.read(spark, path, groupCols)
      .select(col("k"), col("ndv_est")).orderBy("k").as[(String, Long)].collect().toSeq
    val directNdv = all.groupBy("k")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).as("e"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    assert(mergedNdv == directNdv)
    // state is one row per group — the scale contract
    assert(VersionedTable.read(spark, path).count() == all.select("k").distinct().count())
    all.unpersist()
  }

  test("batch order does not matter") {
    val all = fixture
    val parts = Seq(
      all.filter(col("v") <= 100), all.filter(col("v") > 100 && col("v") <= 200),
      all.filter(col("v") > 200))
    def build(order: Seq[DataFrame]): Seq[(String, Long, Double, Double, Double)] = {
      val p = Files.createTempDirectory("mroll_ord").toString + "/t"
      order.foreach(b => MaterializedRollup.refresh(spark, p, b, groupCols, "v", "u"))
      finalizedRows(p)
    }
    assert(build(parts) == build(parts.reverse))
  }

  test("streaming-maintained view: the rollup tracks the stream and equals the batch aggregate") {
    val base = Files.createTempDirectory("mroll_stream").toString
    val src = s"$base/src"; java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"
    def writeJsonl(name: String, rows: Seq[(String, Double, Long)]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(src, name),
        rows.map { case (k, v, u) => s"""{"k":"$k","v":$v,"u":$u}""" }.mkString("", "\n", "\n"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("u", org.apache.spark.sql.types.LongType)))
    val rowsA = (1 to 120).map(i => (s"g${i % 5}", i.toDouble, (i % 13).toLong))
    val rowsB = (121 to 200).map(i => (s"g${i % 5}", i.toDouble, (i % 13).toLong))
    writeJsonl("a.json", rowsA)
    writeJsonl("b.json", rowsB)
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(src)
    val q = graft.streaming.EventStreams.startMaterializedRollupSink(
      stream, tbl, "mv", ckpt, groupCols, "v", "u")
    q.processAllAvailable(); q.stop(); q.awaitTermination(60000)
    val all = (rowsA ++ rowsB).toDF("k", "v", "u")
    assert(finalizedRows(tbl) == direct(all))
  }

  test("a replayed (writer, batch) refresh is skipped and changes nothing") {
    val path = Files.createTempDirectory("mroll_txn").toString + "/t"
    val all = fixture
    val b0 = all.filter(col("v") <= 150)
    val b1 = all.filter(col("v") > 150)
    assert(MaterializedRollup.refresh(spark, path, b0, groupCols, "v", "u",
      txn = Some("mv" -> 0L)).isDefined)
    assert(MaterializedRollup.refresh(spark, path, b1, groupCols, "v", "u",
      txn = Some("mv" -> 1L)).isDefined)
    val before = finalizedRows(path)
    val versionsBefore = VersionedTable.versions(spark, path)
    // replay the last micro-batch — must be a no-op, not a double merge
    assert(MaterializedRollup.refresh(spark, path, b1, groupCols, "v", "u",
      txn = Some("mv" -> 1L)).isEmpty)
    assert(finalizedRows(path) == before)
    assert(VersionedTable.versions(spark, path) == versionsBefore)
    assert(before == direct(all))
  }
}
