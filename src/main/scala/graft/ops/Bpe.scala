package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed BPE (byte-pair-encoding) vocabulary induction — tokenizer
  * TRAINING as a corpus-scale Spark job.
  *
  * The published algorithm (Sennrich et al., ACL'16) is a greedy loop:
  * count adjacent symbol pairs over the corpus, merge the most frequent
  * pair everywhere, repeat. The Spark-first decomposition exploits that
  * after ONE corpus-sized shuffle (word → frequency), every later step
  * runs on the DISTINCT-WORD table — vocabulary-sized (≲ millions of
  * rows at 100 TB), not corpus-sized — because a pair's corpus count is
  * just its count within each distinct word × that word's frequency:
  *
  *  1. `words`: one `groupBy(word)` over the corpus — the only shuffle
  *     that scales with data volume; each word becomes its character
  *     symbol sequence.
  *  2. per merge: adjacent pairs of each word's current symbols, weighted
  *     by word frequency, one vocabulary-sized aggregate; the argmax pair
  *     (ONE row) collects to the driver; a narrow higher-order-function
  *     fold rewrites the symbol arrays. N merges = N small jobs.
  *
  * Determinism: ties on pair frequency break lexicographically (left,
  * then right symbol) — spec-pinned against an independent in-memory
  * reference implementation. Pair counting is plain adjacent counting
  * (overlaps included: "aaa" holds (a,a) twice); the left-to-right
  * non-overlapping APPLY below is the standard greedy semantics, and the
  * reference implementation mirrors both choices exactly. */
object Bpe {

  final case class MergeRule(rank: Int, left: String, right: String, freq: Long)

  /** Left-to-right non-overlapping merge of adjacent (a, b) into a+b —
    * a codegen-free but narrow per-row fold via `aggregate`; after a
    * merge the fused symbol no longer equals `a`, so "aaa" merges to
    * ["aa", "a"], the standard greedy behavior. */
  private def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** The distinct-word frequency table with each word as its initial
    * character-symbol sequence — the ONE corpus-sized pass. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("w"), ""))

  /** Train `numMerges` BPE merge rules over the corpus. Stops early when
    * no adjacent pair reaches `minPairFreq`. Returns the ordered rules;
    * the per-iteration driver traffic is exactly ONE (pair, count) row. */
  def train(
      df: DataFrame, textCol: String, numMerges: Int,
      minPairFreq: Long = 2L): Seq[MergeRule] = {
    require(numMerges >= 1, "need at least one merge")
    var words = wordTable(df, textCol).cache()
    words.count() // materialize before the loop so the corpus scan runs once
    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    try {
      for (rank <- 0 until numMerges) {
        val best = words
          .select(
            col("freq"),
            explode(
              zip_with(
                slice(col("syms"), lit(1), size(col("syms")) - 1),
                slice(col("syms"), lit(2), size(col("syms")) - 1),
                (l, r) => struct(l.as("a"), r.as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("freq").as("n"))
          .orderBy(desc("n"), asc("a"), asc("b"))
          .limit(1)
          .collect()
        if (best.isEmpty || best(0).getAs[Long]("n") < minPairFreq)
          return rules.toSeq
        val (a, b, n) =
          (best(0).getAs[String]("a"), best(0).getAs[String]("b"), best(0).getAs[Long]("n"))
        rules += MergeRule(rank, a, b, n)
        val next = words.withColumn("syms", mergePair(col("syms"), a, b)).cache()
        next.count() // keep each iteration's lineage one step deep
        words.unpersist()
        words = next
      }
      rules.toSeq
    } finally words.unpersist()
  }

  /** Segment a text column with trained rules, applied in rank order
    * within each whitespace word — a chain of narrow folds built on the
    * `transform` lambda variable (nested higher-order functions compose
    * in the Column API; no shuffle anywhere). Fine for rule counts in
    * the hundreds; for full production vocabularies broadcast the rank
    * map and encode per partition instead. */
  def segment(df: DataFrame, textCol: String, rules: Seq[MergeRule]): DataFrame =
    df.withColumn(
      "bpe_tokens",
      flatten(transform(
        TextFunctions.tokens(col(textCol)),
        w => rules.foldLeft(split(w, "")) { (c, r) => mergePair(c, r.left, r.right) })))

  /** Word-boundary-preserving segmentation: `bpe_words` is one token
    * array PER WORD (array<array<string>>), the shape [[decode]] can
    * invert — [[segment]]'s flat form loses the boundaries. Same fold,
    * same zero-shuffle economics. */
  def segmentWords(df: DataFrame, textCol: String, rules: Seq[MergeRule]): DataFrame =
    df.withColumn(
      "bpe_words",
      transform(
        TextFunctions.tokens(col(textCol)),
        w => rules.foldLeft(split(w, "")) { (c, r) => mergePair(c, r.left, r.right) }))

  /** Invert [[segmentWords]]: BPE merges never cross word boundaries, so
    * joining symbols within each word and words with single spaces
    * reconstructs the whitespace-normalized text EXACTLY — the lossless
    * round-trip every tokenizer owes its training data (BpeSpec pins
    * decode∘segment == normalized identity on the fixture corpus). */
  def decode(bpeWords: Column): Column =
    concat_ws(" ", transform(bpeWords, ws => concat_ws("", ws)))

  /** The SCALE path for encoding (the production shape [[segment]]'s
    * Scaladoc points at): apply the merge chain once per DISTINCT word —
    * the vocabulary-sized table, exactly the economics of [[train]] — and
    * join the per-word token count back to the corpus on the word key.
    * At 100 TB the corpus-sized work is one explode + one keyed join;
    * the merge folds run on ≲ millions of distinct words, not trillions
    * of corpus tokens. Returns (id, n_words, n_bpe_tokens) per row;
    * BpeSpec pins it row-for-row against the direct [[segment]] fold. */
  def encodeDistinct(
      df: DataFrame, textCol: String, idCol: String,
      rules: Seq[MergeRule]): DataFrame = {
    val words = df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val perWord = words.select("w").distinct()
      .withColumn(
        "n_sym",
        size(rules.foldLeft(split(col("w"), "")) { (c, r) => mergePair(c, r.left, r.right) }))
    words
      .join(perWord, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
  }
}
