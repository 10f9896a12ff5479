package graft

import org.apache.spark.sql.functions._

import graft.ops.{Ann, SemDedup}

/** SemDeDup on a PLANTED fixture: `nGroups` well-separated base directions,
  * each with `dupsPerGroup` tiny perturbations (near-identical, cosine
  * ≈ 1) plus `noise` lone vectors. The planted pairs are what semantic
  * dedup must find; the lone vectors are what it must keep.
  */
class SemDedupSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 16
  private val nGroups = 4
  private val dupsPerGroup = 5
  private val nNoise = 30

  /** Deterministic fixture. Base directions are one-hot-ish (orthogonal);
    * duplicates add 1e-3 jitter; noise vectors get a fresh random direction
    * each (seeded), far from every base with overwhelming probability. */
  private lazy val corpus = {
    val rng = new scala.util.Random(7L)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Seq[Double])]()
    var id = 0L
    for (g <- 0 until nGroups) {
      val base = Array.tabulate(dim)(i => if (i == g) 1.0 else 0.0)
      for (_ <- 0 until dupsPerGroup) {
        rows += ((id, base.map(_ + rng.nextGaussian() * 1e-3).toSeq)); id += 1
      }
    }
    for (_ <- 0 until nNoise) {
      rows += ((id, Seq.fill(dim)(rng.nextGaussian()))); id += 1
    }
    rows.toSeq.toDF("vec_id", "emb")
  }

  private val threshold = 0.95

  private lazy val bruteForce =
    Ann.nearDupPairs(corpus, corpus, threshold)
      .select(col("probe_id").as("a_id"), col("vec_id").as("b_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  private lazy val semPairs =
    SemDedup.nearDupPairs(corpus, nClusters = nGroups + 2, minSim = threshold, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("planted fixture sanity: brute force finds exactly the planted pairs") {
    val planted = (for {
      g <- 0 until nGroups
      a <- 0 until dupsPerGroup; b <- (a + 1) until dupsPerGroup
    } yield (g * dupsPerGroup + a.toLong, g * dupsPerGroup + b.toLong)).toSet
    assert(bruteForce.keySet == planted)
  }

  test("every reported pair is exact: present in brute force with the same sim") {
    assert(semPairs.nonEmpty)
    semPairs.foreach { case (k, sim) =>
      assert(bruteForce.contains(k), s"false pair $k")
      assert(bruteForce(k) == sim, s"sim mismatch for $k")
    }
  }

  test("recall: near-identical vectors land in one cell, so planted pairs are found") {
    val recall = semPairs.size.toDouble / bruteForce.size
    assert(recall >= 0.9, s"recall $recall (${semPairs.size}/${bruteForce.size})")
  }

  test("dedup keeps exactly one representative per group plus every lone vector") {
    val survivors = SemDedup
      .representatives(
        corpus,
        SemDedup.nearDupPairs(corpus, nClusters = nGroups + 2, minSim = threshold, seed = 42L))
      .select("vec_id").as[Long].collect().toSet
    // From each planted group only the min id survives; every noise id stays.
    val groupReps = (0 until nGroups).map(g => (g * dupsPerGroup).toLong).toSet
    val noiseIds = (nGroups * dupsPerGroup until nGroups * dupsPerGroup + nNoise)
      .map(_.toLong).toSet
    // Allow noise vectors to merge only if brute force itself paired them
    // (it does not, by the sanity test) — so the expectation is exact.
    assert(survivors == groupReps ++ noiseIds)
  }

  test("oversized cells subdivide under the cap and pairs stay exact") {
    val pairs = SemDedup
      .nearDupPairs(
        corpus, nClusters = 2, minSim = threshold, seed = 42L, maxClusterSize = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Subdivision may cost recall but never precision.
    pairs.foreach(k => assert(bruteForce.contains(k), s"false pair $k"))
    // And the bound itself: no (cell, sub) bucket exceeds the cap.
    val assigned = SemDedup.assignCells(corpus, 2, 42L)
    val counts = assigned.groupBy("cell").agg(count(lit(1)).as("__n"))
    val bucketSizes = assigned
      .join(broadcast(counts), Seq("cell"))
      .withColumn("__nsub", ceil(col("__n") / lit(6.0)).cast("int"))
      .withColumn("sub", pmod(xxhash64(col("vec_id")), col("__nsub")).cast("int"))
      .groupBy("cell", "sub").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    // Hash split is approximate: allow 2x headroom over the nominal cap,
    // the point is boundedness, not exact equality.
    assert(bucketSizes.forall(_ <= 12), s"bucket sizes: ${bucketSizes.mkString(",")}")
  }
}
