package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding search — the memory-bound ANN
  * path (Jégou et al., TPAMI'11): each vector compresses to `m` one-byte
  * codes (one k-means codebook per disjoint subspace), and queries score
  * the ENTIRE compressed corpus with asymmetric distance computation
  * (ADC) — per candidate, `m` table lookups instead of `dim` multiplies.
  *
  * Why this is the 100 TB shape: a 64-dim float corpus is 256 B/vector;
  * PQ at m=8 is 8 B/vector — 32× more corpus per executor-GB, and the
  * scan is a narrow mapPartitions over code arrays with a bounded
  * per-partition top-k heap (partitions × probes × k rows ever shuffle).
  * Compose with the IVF cell layout for sublinear candidate counts; PQ
  * alone replaces the full-precision linear scan with a compressed one.
  *
  * All scoring is on L2-NORMALIZED vectors, so ADC's squared-L2 ranking
  * equals cosine ranking (||a−b||² = 2 − 2·cos) and results are reported
  * as approximate cosine similarity, comparable with [[Ann]] outputs.
  *
  * Training runs one Spark ML k-means per subspace — `trainFraction`
  * subsamples the corpus first (codebooks need thousands of points per
  * centroid, not the whole corpus; sampling is the standard practice). */
object Pq {

  /** `cents(sub)(code)` = that subspace's centroid (length `dsub`). */
  final case class Codebook(m: Int, ksub: Int, dsub: Int, cents: Array[Array[Array[Double]]]) {
    require(cents.length == m && cents.forall(_.length == ksub))
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) * inv; i += 1 }
    out
  }

  /** Train an (m × ksub) codebook over `corpus` (vec_id, emb). */
  def train(
      corpus: DataFrame, m: Int, ksub: Int = 16, seed: Long = 42L,
      trainFraction: Double = 1.0): Codebook = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = corpus.select(size(col("emb"))).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide the embedding dim $dim")
    val dsub = dim / m
    val sampled =
      if (trainFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, trainFraction, seed)
    // one normalized pass shared by all m fits
    val unit = sampled.select(col("emb").cast("array<double>").as("emb"))
      .withColumn("__n", sqrt(aggregate(col("emb"), lit(0.0), (a, x) => a + x * x)))
      .filter(col("__n") > 0)
      .withColumn("emb", transform(col("emb"), x => x / col("__n")))
      .cache()
    try {
      val cents = (0 until m).toArray.map { j =>
        val sub = unit.select(
          array_to_vector(slice(col("emb"), lit(j * dsub + 1), lit(dsub))).as("__vec"))
        new KMeans().setK(ksub).setSeed(seed + j).setFeaturesCol("__vec")
          .fit(sub).clusterCenters.map(_.toArray)
      }
      Codebook(m, ksub, dsub, cents)
    } finally { unit.unpersist(); () }
  }

  /** Encode (vec_id, emb) → (vec_id, codes): per subspace, the nearest
    * codebook centroid's index. One narrow pass, codebook broadcast. */
  def encode(corpus: DataFrame, cb: Codebook): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(cb)
    corpus.select(col("vec_id"), col("emb").cast("array<double>").as("emb"))
      .as[(Long, Array[Double])]
      .map { case (id, raw) =>
        val c = b.value
        val v = normalize(raw)
        val codes = new Array[Int](c.m)
        var j = 0
        while (j < c.m) {
          val cs = c.cents(j); val off = j * c.dsub
          var best = 0; var bestD = Double.MaxValue; var k = 0
          while (k < cs.length) {
            val cent = cs(k); var d = 0.0; var i = 0
            while (i < c.dsub) { val t = v(off + i) - cent(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = k }
            k += 1
          }
          codes(j) = best; j += 1
        }
        (id, codes.toSeq)
      }
      .toDF("vec_id", "codes")
  }

  /** ADC top-k: per probe, a (m × ksub) distance table against the
    * codebook; every encoded candidate scores with m lookups. Probes must
    * be small (they broadcast with their tables); the corpus side emits
    * at most probes × k rows per PARTITION (bounded heaps), and one final
    * per-probe window ranks the survivors. Returns (probe_id, vec_id,
    * sim) with sim = 1 − d²/2, the cosine estimate on unit vectors. */
  def queryTopK(encoded: DataFrame, cb: Codebook, probes: DataFrame, k: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val probeRows = probes.select(col("vec_id"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    // tables(p)(j*ksub + code) = squared subdistance of probe p to that code
    val tables: Array[(Long, Array[Double])] =
      probeRows.map { case (pid, raw) => (pid, adcTable(raw, cb)) }
    val tb = spark.sparkContext.broadcast(tables)
    val ksubL = cb.ksub
    val partial = encoded.select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])]
      .mapPartitions { it =>
        val ts = tb.value
        // one bounded (sim, vec_id) heap per probe — min-heap so the
        // worst survivor evicts first
        val heaps = ts.map { case (pid, _) =>
          pid -> scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) })
        }
        it.foreach { case (id, codes) =>
          var p = 0
          while (p < ts.length) {
            val (pid, t) = ts(p)
            if (pid != id) {
              var d = 0.0; var j = 0
              while (j < codes.length) { d += t(j * ksubL + codes(j)); j += 1 }
              val sim = 1.0 - d / 2.0
              val h = heaps(p)._2
              if (h.size < k) h.enqueue((sim, id))
              else if (sim > h.head._1 || (sim == h.head._1 && id < h.head._2)) {
                h.dequeue(); h.enqueue((sim, id))
              }
            }
            p += 1
          }
        }
        heaps.iterator.flatMap { case (pid, h) => h.iterator.map { case (s, id) => (pid, id, s) } }
      }
      .toDF("probe_id", "vec_id", "sim0")
    val w = Window.partitionBy("probe_id").orderBy(col("sim0").desc, col("vec_id"))
    partial
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id"), round(col("sim0"), 6).as("sim"))
  }

  /** IVF×PQ — the full production composition (FAISS's IVFPQ): the IVF
    * cell layout bounds WHICH candidates each probe scores (sublinear:
    * ~corpus × nprobe / nlist rows) and PQ bounds HOW MUCH each candidate
    * costs (m byte-code lookups, 32× less memory). Encode once against an
    * [[Ann.IvfIndex]]; query with per-probe cell masks riding the same
    * broadcast as the ADC tables. With nprobe = nlist this degrades to
    * exactly the plain compressed scan (spec-pinned). */
  def encodeIvfPq(index: Ann.IvfIndex, cb: Codebook): DataFrame =
    encode(index.assigned, cb)
      .join(index.assigned.select(col("vec_id"), col("cell")), "vec_id")

  def queryIvfPq(
      encodedCells: DataFrame, centroids: Array[Array[Double]], cb: Codebook,
      probes: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val spark = encodedCells.sparkSession
    import spark.implicits._
    require(nprobe >= 1 && nprobe <= centroids.length,
      s"nprobe must be in [1, ${centroids.length}]")
    val probeRows = probes.select(col("vec_id"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    // nprobe nearest cells per probe, by the INDEX metric (L2 on raw
    // vectors — the same rule that assigned the corpus)
    val cellsOf: Map[Long, Set[Int]] = probeRows.map { case (pid, emb) =>
      val ranked = centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < math.min(c.length, emb.length)) { val t = c(j) - emb(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2)
      pid -> ranked.toSet
    }.toMap
    val wanted = cellsOf.values.flatten.toSet
    // cell-partition pruning first: rows outside every probed cell never decode
    val scoped = encodedCells.filter(col("cell").isin(wanted.toSeq.map(Integer.valueOf): _*))
    val tables = probeRows.map { case (pid, raw) => (pid, adcTable(raw, cb)) }
    val tb = spark.sparkContext.broadcast((tables, cellsOf))
    val ksubL = cb.ksub
    val partial = scoped.select(col("vec_id"), col("codes"), col("cell"))
      .as[(Long, Seq[Int], Int)]
      .mapPartitions { it =>
        val (ts, masks) = tb.value
        val heaps = ts.map { case (pid, _) =>
          pid -> scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) })
        }
        it.foreach { case (id, codes, cell) =>
          var p = 0
          while (p < ts.length) {
            val (pid, t) = ts(p)
            if (pid != id && masks(pid).contains(cell)) {
              var d = 0.0; var j = 0
              while (j < codes.length) { d += t(j * ksubL + codes(j)); j += 1 }
              val sim = 1.0 - d / 2.0
              val h = heaps(p)._2
              if (h.size < k) h.enqueue((sim, id))
              else if (sim > h.head._1 || (sim == h.head._1 && id < h.head._2)) {
                h.dequeue(); h.enqueue((sim, id))
              }
            }
            p += 1
          }
        }
        heaps.iterator.flatMap { case (pid, h) => h.iterator.map { case (s, id) => (pid, id, s) } }
      }
      .toDF("probe_id", "vec_id", "sim0")
    val w = Window.partitionBy("probe_id").orderBy(col("sim0").desc, col("vec_id"))
    partial.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id"), round(col("sim0"), 6).as("sim"))
  }

  /** The (m × ksub) ADC table of one probe against the codebook. */
  private def adcTable(raw: Array[Double], cb: Codebook): Array[Double] = {
    val v = normalize(raw)
    val t = new Array[Double](cb.m * cb.ksub)
    var j = 0
    while (j < cb.m) {
      val off = j * cb.dsub; var c = 0
      while (c < cb.ksub) {
        val cent = cb.cents(j)(c); var d = 0.0; var i = 0
        while (i < cb.dsub) { val x = v(off + i) - cent(i); d += x * x; i += 1 }
        t(j * cb.ksub + c) = d; c += 1
      }
      j += 1
    }
    t
  }

  /** Two-stage retrieval — the production deployment of PQ: the
    * compressed scan nominates a `shortlist` of candidates per probe
    * (cheap, whole corpus), then ONLY those rows re-rank at full
    * precision (exact cosine against the uncompressed vectors, a
    * shortlist-sized semi-join — I/O ∝ probes × shortlist, not corpus).
    * Recall converges to exact as the shortlist widens, at compressed-
    * scan cost; the standard quality knob. */
  def queryTopKRerank(
      encoded: DataFrame, corpus: DataFrame, cb: Codebook, probes: DataFrame,
      k: Int, shortlist: Int = 50): DataFrame = {
    import graft.functions.CosineSimilarity
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val cand = queryTopK(encoded, cb, probes, shortlist)
      .select(col("probe_id"), col("vec_id"))
    val p = probes.select(col("vec_id").as("probe_id"), col("emb").as("p_emb"))
    val exact = cand
      .join(corpus, "vec_id") // shortlist-sized semi-join pulls full vectors
      .join(broadcast(p), "probe_id")
      .select(
        col("probe_id"), col("vec_id"),
        round(CosineSimilarity(col("emb"), col("p_emb")), 6).as("sim"))
      .filter(!isnan(col("sim")))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("vec_id"))
    exact.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("probe_id", "vec_id", "sim")
  }
}
