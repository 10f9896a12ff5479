package graft

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.InterleaveBits
import graft.io.Sinks

/** Z-order clustering: the InterleaveBits expression's arithmetic, and the
  * layout property the whole feature exists for — rows matching a narrow
  * predicate on EITHER clustered dimension live in few files, so parquet
  * min/max stats can skip the rest (single-key range clustering only ever
  * buys this on one dimension).
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("interleave_bits matches bit-by-bit golden values through the expression") {
    // Golden values recomputed independently (DuckDB bit arithmetic, the
    // same formula as the q109 oracle), including both domain boundaries.
    val cases = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L), (2L, 3L, 14L),
      (123456789L, 987654321L, 764965344238471955L),
      (2147483647L, 2147483647L, 4611686018427387903L))
    cases.foreach { case (x, y, z) =>
      assert(InterleaveBits.zValue(x, y) == z, s"zValue($x, $y)")
    }
    val got = cases.toDF("x", "y", "z")
      .select(InterleaveBits(col("x"), col("y")).as("got"), col("z"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("zOrderedParquet clusters BOTH dims; single-key clustering only one") {
    val base = Files.createTempDirectory("zorder").toString
    val n = 1L << 14
    // 128x128 grid: ideal z-layout at 16 files = 16 aligned 32x32 tiles.
    val grid = spark.range(n).select(
      (col("id") % 128).as("x"),
      (col("id") / 128).as("y"),
      col("id").as("payload"))
    Sinks.zOrderedParquet(grid, s"$base/z", "x", "y", files = 16)
    Sinks.clusteredParquet(grid, s"$base/linear", Seq("x"), files = 16)

    def filesTouched(path: String, pred: Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()

    // A 1/8-width slab on either axis ideally touches 4 of 16 tiles;
    // repartitionByRange samples boundaries, so allow up to 8.
    assert(filesTouched(s"$base/z", col("x") < 16) <= 8, "z-layout: x-slab not local")
    assert(filesTouched(s"$base/z", col("y") < 16) <= 8, "z-layout: y-slab not local")
    // Single-key clustering: tight on its key, useless on the other —
    // every x-range file contains all y values.
    assert(filesTouched(s"$base/linear", col("x") < 16) <= 4)
    assert(filesTouched(s"$base/linear", col("y") < 16) >= 12,
      "y-slab unexpectedly local under x-only clustering (test premise broken)")

    // Round-trip: all rows present, helper z column never hits disk.
    val back = spark.read.parquet(s"$base/z")
    assert(back.count() == n)
    assert(back.columns.sorted.toSeq == Seq("payload", "x", "y"))
  }

  test("interleave_bits is SQL-callable via extensions and Registry") {
    graft.functions.Registry.registerAll(spark)
    assert(spark.sql("SELECT interleave_bits(2, 3) AS z").head().getLong(0) == 14L)
  }
}
