package graft

import org.apache.spark.sql.functions._

import graft.ops.Ann

/** IVF index lifecycle (VERDICT r1 item 4): one k-means build serves many
  * query rounds, and a saved index reloads to identical results — the
  * properties that make the layout worth its build cost at scale.
  */
class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val corpus = {
    val rng = new scala.util.Random(7)
    // 8 well-separated clusters in 16d
    val rows = (0 until 400).map { i =>
      val base = Array.fill(16)(0.0f)
      base(i % 8) = 5.0f
      (i.toLong, base.map(v => v + rng.nextGaussian().toFloat * 0.1f))
    }
    Ann.prepared(rows.toDF("vec_id", "embedding"), "embedding", "vec_id")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("two query rounds reuse one build and match per-round fused results") {
    val index = Ann.buildIvfIndex(corpus, nlist = 8)
    val probesA = corpus.filter(col("vec_id") < 4)
    val probesB = corpus.filter(col("vec_id") >= 4 && col("vec_id") < 8)

    val a = asSet(Ann.queryIvf(index, probesA, 5, nprobe = 2))
    val b = asSet(Ann.queryIvf(index, probesB, 5, nprobe = 2))
    // the reused-build answers equal what a fresh build-per-query returns
    assert(a == asSet(Ann.ivfTopK(corpus, probesA, 5, nlist = 8, nprobe = 2)))
    assert(b == asSet(Ann.ivfTopK(corpus, probesB, 5, nlist = 8, nprobe = 2)))
    assert(a.nonEmpty && b.nonEmpty && a.map(_._1).intersect(b.map(_._1)).isEmpty)
  }

  test("saved index reloads to identical query results (cell-partitioned parquet)") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val index = Ann.buildIvfIndex(corpus, nlist = 8)
    Ann.saveIvfIndex(index, dir)
    val loaded = Ann.loadIvfIndex(spark, dir)

    assert(loaded.centroids.length == index.centroids.length)
    val probes = corpus.filter(col("vec_id") < 8)
    assert(
      asSet(Ann.queryIvf(loaded, probes, 5, nprobe = 2)) ==
        asSet(Ann.queryIvf(index, probes, 5, nprobe = 2)))
    // on-disk layout is one directory per cell -> probed cells prune the scan
    val cellDirs = new java.io.File(s"$dir/cells").listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.length == 8, cellDirs.mkString(","))
  }

  test("incremental ingestion: appended vectors land in their nearest cell and are findable") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    val resident = corpus.filter(col("vec_id") < 200)
    val increment = corpus.filter(col("vec_id") >= 200)
    Ann.saveIvfIndex(Ann.buildIvfIndex(resident, nlist = 8), dir)
    val appended = Ann.appendToIvfIndex(spark, dir, increment)
    assert(appended == 200L)
    val loaded = Ann.loadIvfIndex(spark, dir)
    assert(loaded.assigned.count() == 400)
    // every appended row sits in its driver-computed nearest cell
    val cs = loaded.centroids
    val placed = loaded.assigned.filter(col("vec_id") >= 200)
      .select("vec_id", "emb", "cell")
      .as[(Long, Seq[Double], Int)].collect()
    assert(placed.length == 200)
    placed.foreach { case (id, emb, cell) =>
      val best = cs.indices.minBy { idx =>
        val c = cs(idx)
        c.indices.map(i => (c(i) - emb(i)) * (c(i) - emb(i))).sum
      }
      assert(cell == best, s"vec $id in cell $cell, nearest is $best")
    }
    // an appended vector is found by a probe at its own position (sim 1)
    val probe = increment.filter(col("vec_id") === 300)
      .select(lit(9999L).as("vec_id"), col("emb"))
    val top = Ann.queryIvf(loaded, probe, k = 1, nprobe = 1).collect()
    assert(top.length == 1 && top(0).getLong(1) == 300L && top(0).getDouble(2) == 1.0,
      top.mkString(","))
  }

  test("cellSkew rises under a drifted append and a rebuild restores it") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_drift").toString
    Ann.saveIvfIndex(Ann.buildIvfIndex(corpus, nlist = 8), dir)
    val healthy = Ann.cellSkew(spark, dir)
    assert(healthy.nCells == 8 && healthy.totalRows == 400)
    assert(healthy.skew < 2.0, s"balanced build should be near-uniform: $healthy")
    assert(!healthy.needsRebuild())

    // drift: 400 new vectors in FOUR new modes (dims 8..11, unseen at
    // build time) sharing a small dim-0 bias — under the FROZEN centroids
    // the bias makes cell 0 nearest for all of them, so they pile into
    // one cell; a rebuild gives the new modes their own cells
    val rng = new scala.util.Random(11)
    val drifted = (1000 until 1400).map { i =>
      val base = Array.fill(16)(0.0)
      base(0) = 1.0
      base(8 + i % 4) = 5.0
      (i.toLong, (base.map(_ + rng.nextGaussian() * 0.1)).toSeq)
    }.toDF("vec_id", "emb")
    Ann.appendToIvfIndex(spark, dir, drifted)
    val skewed = Ann.cellSkew(spark, dir)
    assert(skewed.totalRows == 800)
    assert(skewed.skew > healthy.skew * 2, s"drift must show up: $healthy -> $skewed")
    assert(skewed.needsRebuild(), s"monitor must fire: $skewed")

    // rebuild sized to the grown corpus (8 old + 4 new modes): skew back
    // near uniform, every row retained
    val rebuilt = Ann.rebuildIvfIndex(spark, dir, nlist = 12)
    assert(rebuilt.totalRows == 800 && rebuilt.nCells == 12)
    assert(rebuilt.skew < skewed.skew / 2, s"rebuild must restore balance: $skewed -> $rebuilt")
    // the rebuilt index still answers: a drifted vector finds itself
    val loaded = Ann.loadIvfIndex(spark, dir)
    val probe = drifted.filter(col("vec_id") === 1200)
      .select(lit(8888L).as("vec_id"), col("emb"))
    val top = Ann.queryIvf(loaded, probe, k = 1, nprobe = 2).collect()
    assert(top.length == 1 && top(0).getLong(1) == 1200L)
  }
}
