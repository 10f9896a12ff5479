package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.ops.IncrementalJoinView
import graft.ops.IncrementalJoinView.Spec

/** The JOIN view maintained under STREAMING ingestion (the
  * [[IncrementalJoinView]] twin of q166's single-table loop): a stream
  * commits fact batches exactly-once via `commitStreamBatch` inside
  * `foreachBatch`, the same hook refreshes the view, dim updates
  * interleave between batches — and after every step the view equals a
  * full recompute, with replays no-ops through both txn gates. */
class StreamedJoinViewSpec extends SparkSuite {
  import spark.implicits._

  test("foreachBatch commit+refresh keeps the view current; dim updates interleave") {
    val root = java.nio.file.Files.createTempDirectory("sjv").toString
    val factP = s"$root/fact"; val dimP = s"$root/dim"; val viewP = s"$root/view"
    VersionedTable.commitAppend(
      Seq((10L, "red"), (20L, "blue")).toDF("d_id", "seg"), dimP)
    // seed the fact so the view can bootstrap before streaming starts
    VersionedTable.commitAppend(Seq((0L, 10L, 1.0)).toDF("k", "dk", "v"), factP)
    val sp = Spec(factP, dimP, fk = "dk", dimKey = "d_id",
      groupCols = Seq("seg"), sumCols = Seq("v"))
    assert(IncrementalJoinView.refresh(spark, sp, viewP, "c").isDefined)

    def expected(): Map[String, (Long, Double)] = {
      val f = VersionedTable.read(spark, factP)
      val d = VersionedTable.read(spark, dimP)
      f.join(d, f("dk") === d("d_id"))
        .groupBy("seg").agg(count(lit(1)).as("n"), sum(col("v").cast("double")).as("s"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    }
    def viewState(): Map[String, (Long, Double)] =
      VersionedTable.read(spark, viewP).collect()
        .map(r => r.getAs[String]("seg") ->
          ((r.getAs[Long]("cnt"), r.getAs[Double]("sum_v")))).toMap

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Double)]
    val q = ms.toDS().toDF("k", "dk", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        VersionedTable.commitStreamBatch(batch, factP, "ingest", id)
        IncrementalJoinView.refresh(spark, sp, viewP, "c")
        ()
      }
      .start()
    try {
      ms.addData((1L, 10L, 5.0), (2L, 20L, 7.0)); q.processAllAvailable()
      assert(viewState() == expected())
      // dim update BETWEEN stream batches: red migrates to green
      VersionedTable.merge(spark, dimP, Seq((10L, "green")).toDF("d_id", "seg"), Seq("d_id"))
      ms.addData((3L, 10L, 11.0)); q.processAllAvailable()
      assert(viewState() == expected())
      assert(viewState().contains("green") && !viewState().contains("red"))
      // idle refresh is a no-op; state unchanged
      assert(IncrementalJoinView.refresh(spark, sp, viewP, "c").isEmpty)
      assert(viewState() == expected())
    } finally q.stop()
  }
}
