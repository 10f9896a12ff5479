package graft

import graft.ops.ConnectedComponents

class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)], maxIter: Int = 20): (Map[Long, Long], Int) = {
    val (df, rounds) = ConnectedComponents.label(edges.toDF("src", "dst"), maxIter)
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("path graph: min label propagates the full chain length") {
    // 0-1-2-...-9: worst case for propagation (diameter 9)
    val (labels, rounds) = labelsOf((0L until 9L).map(i => (i, i + 1)))
    assert(labels == (0L to 9L).map(_ -> 0L).toMap)
    assert(rounds <= 12)
  }

  test("disjoint cliques keep separate components") {
    val cliqueA = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val cliqueB = for (i <- 20L to 22L; j <- (i + 1) to 22L) yield (i, j)
    val (labels, rounds) = labelsOf(cliqueA ++ cliqueB)
    assert((10L to 13L).forall(labels(_) == 10L))
    assert((20L to 22L).forall(labels(_) == 20L))
    assert(rounds <= 3, s"cliques are diameter 1, took $rounds rounds")
  }

  test("direction and duplicate edges do not matter") {
    val (labels, _) = labelsOf(Seq((5L, 3L), (3L, 5L), (5L, 3L), (4L, 5L)))
    assert(labels == Map(3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("maxIter caps an unconverged chain and reports it") {
    val (labels, rounds) = labelsOf((0L until 9L).map(i => (i, i + 1)), maxIter = 2)
    assert(rounds == 2)
    assert(labels(9L) != 0L, "a 2-round cap cannot close a diameter-9 path")
  }

  test("self-loop-only nodes stay in the node set as singleton components") {
    val (labels, _) = labelsOf(Seq((7L, 7L), (1L, 2L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
    val (empty, rounds) = labelsOf(Seq.empty)
    assert(empty.isEmpty && rounds <= 1)
  }

  test("reliable checkpointDir mode matches localCheckpoint results") {
    val edges = ((0L until 5L).map(i => (i, i + 1)) ++ Seq((20L, 21L))).toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    try {
      val (local, localRounds) = ConnectedComponents.label(edges)
      val (reliable, reliableRounds) = ConnectedComponents.label(edges, checkpointDir = Some(dir))
      assert(reliableRounds == localRounds)
      assert(reliable.orderBy("id").collect().toSeq == local.orderBy("id").collect().toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("the label loop is sized to the observed edge count, not pinned to one partition") {
    // guards the Observation plumbing: the map lookup yields Option[Any],
    // and a bare-Number match silently read nEdges as 0 (width 1 always)
    assert(ConnectedComponents.loopWidth(0L, 32, 4L) == 1)
    assert(ConnectedComponents.loopWidth(10L, 32, 4L) == 5) // ceil(20/4)
    assert(ConnectedComponents.loopWidth(1000L, 32, 4L) == 32) // capped
    // end to end: 10 edges with a 4-row target must LAY OUT the loop
    // relations across 5 partitions — only possible if the observed count
    // actually arrived. maxIter=0 returns the initial labels frame, the
    // one carrying the loop's frozen partitioning (later rounds hand back
    // the groupBy output, whose width AQE owns).
    val prev = spark.conf.getOption("spark.graft.cc.loopRowsPerPartition")
    try {
      spark.conf.set("spark.graft.cc.loopRowsPerPartition", "4")
      val edges = (0L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
      val (initial, rounds) = ConnectedComponents.label(edges, maxIter = 0)
      assert(rounds == 0)
      assert(initial.rdd.getNumPartitions == 5,
        s"loop laid out at ${initial.rdd.getNumPartitions} partitions")
      // and a full run on the same conf still labels correctly (one chain)
      val (labels, _) = ConnectedComponents.label(edges)
      assert(labels.select("comp").distinct().count() == 1)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.cc.loopRowsPerPartition", v)
      case None    => spark.conf.unset("spark.graft.cc.loopRowsPerPartition")
    }
  }
}
