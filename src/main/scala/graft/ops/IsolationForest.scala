package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isolation forest (Liu/Ting/Zhou 2008) — unsupervised multivariate
  * anomaly scoring: anomalies are points that random axis-aligned splits
  * ISOLATE quickly, so the expected isolation depth over a forest of
  * random trees, normalized by the average BST depth c(n), is the score
  * s = 2^(−E[h]/c(ψ)) ∈ (0,1) (≈0.5 for inliers, →1 for anomalies).
  * This is the standard screen when no single column is the anomaly —
  * the q156/q195/q200 family watches one metric; this watches the joint
  * shape.
  *
  * Scale shape — the part that matters at 100 TB: training touches a
  * DETERMINISTIC sample of ψ·T rows (md5-ranked global top-k, one
  * distributed TopK — ~25k rows at the defaults, vanishing at any
  * scale), trees are built DRIVER-side from disjoint ψ-row subsamples
  * (a few hundred nodes each) and shipped in the task closure; scoring
  * is row-local traversal of the broadcast forest — no shuffle, no
  * state, embarrassingly parallel. The traversal is data-dependent
  * control flow over a broadcast structure, which the functions API
  * cannot express — the one scoring UDF is the same declared exception
  * as the DdSketch finalizer (everything around it stays codegen).
  *
  * Determinism: the sample is md5-ranked (layout-proof) and the split
  * RNG is seeded per tree — same inputs, same seed ⇒ same scores on any
  * partitioning (spec-pinned). Disjoint subsamples are a documented
  * variant of the paper's independent sampling; at ψ·T ≪ n the
  * difference is immaterial and determinism is worth it. */
object IsolationForest {

  /** Average unsuccessful-search depth of a BST of n nodes — the
    * normalizer c(n); c(1) = 0. */
  private[graft] def cOf(n: Long): Double =
    if (n <= 1L) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n

  /** One node of an isolation tree, array-encoded: internal nodes carry
    * (feature, split, left, right); leaves carry (size, depth). */
  private final case class Node(
      feature: Int, split: Double, left: Int, right: Int,
      leafSize: Long, depth: Int)

  private def buildTree(
      rows: Array[Array[Double]], rng: scala.util.Random, maxDepth: Int)
      : Array[Node] = {
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
    def grow(idx: Array[Int], depth: Int): Int = {
      val me = nodes.length
      nodes += Node(-1, 0.0, -1, -1, idx.length.toLong, depth) // placeholder
      val split =
        if (depth >= maxDepth || idx.length <= 1) None
        else {
          // features with any spread in THIS node's rows are splittable
          val p = rows(0).length
          val candidates = (0 until p).filter { f =>
            var lo = rows(idx(0))(f); var hi = lo
            idx.foreach { i =>
              val v = rows(i)(f)
              if (v < lo) lo = v
              if (v > hi) hi = v
            }
            hi > lo
          }
          if (candidates.isEmpty) None
          else {
            val f = candidates(rng.nextInt(candidates.length))
            var lo = rows(idx(0))(f); var hi = lo
            idx.foreach { i =>
              val v = rows(i)(f)
              if (v < lo) lo = v
              if (v > hi) hi = v
            }
            Some((f, lo + rng.nextDouble() * (hi - lo)))
          }
        }
      split match {
        case None => me // leaf: placeholder already carries (size, depth)
        case Some((f, s)) =>
          val (l, r) = idx.partition(i => rows(i)(f) < s)
          // a degenerate draw (split == hi) can leave one side empty even
          // with spread — retry as leaf rather than loop
          if (l.isEmpty || r.isEmpty) me
          else {
            val li = grow(l, depth + 1)
            val ri = grow(r, depth + 1)
            nodes(me) = Node(f, s, li, ri, 0L, depth)
            me
          }
      }
    }
    grow(rows.indices.toArray, 0)
    nodes.toArray
  }

  private def pathLength(tree: Array[Node], x: Array[Double]): Double = {
    var i = 0
    while (tree(i).feature >= 0) {
      i = if (x(tree(i).feature) < tree(i).split) tree(i).left else tree(i).right
    }
    tree(i).depth + cOf(tree(i).leafSize)
  }

  /** Append `if_score` ∈ (0,1) to `df`. `idCol` seeds the deterministic
    * sample ranking (any stable unique-ish column); `featureCols` must
    * be numeric and non-null — a null feature REFUSES at the row via an
    * explicit `raise_error` guard (a bare cast would pass the null
    * through and the array unboxing would silently impute 0.0, scoring
    * a point that was never observed there — impute first, q239-style). */
  def score(
      df: DataFrame, idCol: String, featureCols: Seq[String],
      nTrees: Int = 100, sampleSize: Int = 256, seed: Long = 42L): DataFrame = {
    require(featureCols.nonEmpty, "isolation forest needs at least one feature")
    require(nTrees >= 1 && sampleSize >= 2,
      s"need nTrees >= 1 and sampleSize >= 2, got $nTrees / $sampleSize")
    val feats = array(featureCols.map(c =>
      when(col(c).isNull, raise_error(lit(
        s"isolation forest feature '$c' is null — features must be imputed " +
          "before scoring (zero-imputation would score a point that was " +
          "never observed)")))
        .otherwise(col(c).cast("double"))): _*)
    // deterministic sample: one distributed TopK on the md5 rank
    val sample = df
      .select(feats.as("fv"),
        md5(concat(lit(s"if-v1:$seed:"), col(idCol).cast("string"))).as("rk"))
      .orderBy("rk")
      .limit(nTrees * sampleSize)
      .select("fv")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= 2, "isolation forest needs at least 2 sampled rows")
    val maxDepth = math.ceil(math.log(sampleSize.toDouble) / math.log(2.0)).toInt
    val rng = new scala.util.Random(seed)
    val trees = (0 until nTrees).map { t =>
      val slice = sample.slice(t * sampleSize, (t + 1) * sampleSize)
      // with fewer rows than ψ·T the tail trees reuse the whole sample
      // from a shifted start so every tree still sees ψ-ish rows
      val rows = if (slice.length >= 2) slice
                 else sample.drop((t * sampleSize) % math.max(1, sample.length - 1))
                   .take(sampleSize) match {
                   case s if s.length >= 2 => s
                   case _ => sample.take(sampleSize)
                 }
      buildTree(rows, new scala.util.Random(rng.nextLong()), maxDepth)
    }.toArray
    val cNorm = cOf(math.min(sampleSize.toLong, sample.length.toLong))
    // row-local traversal of the broadcast forest — the declared UDF
    // exception (data-dependent control flow over a closure structure)
    val scoreUdf = udf { (fv: Seq[Double]) =>
      val x = fv.toArray
      var s = 0.0
      var t = 0
      while (t < trees.length) { s += pathLength(trees(t), x); t += 1 }
      math.pow(2.0, -(s / trees.length) / cNorm)
    }
    df.withColumn("if_score", scoreUdf(feats))
  }
}
