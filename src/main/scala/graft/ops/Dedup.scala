package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for large-corpus pipelines (SURVEY.md §2.11
  * X1/X2). All are shuffle-on-key designs — no cross products over the full
  * corpus — so they scale linearly with data volume:
  *
  *  - exact: hash → groupBy (one shuffle keyed on a 256-bit digest)
  *  - MinHash+LSH: shingle → signature → band → bucket self-join (candidates
  *    only where a band bucket collides)
  *  - SimHash: 64-bit signature → chunk-bucket candidates (pigeonhole: any
  *    pair within hamming distance d < chunks must agree on ≥1 chunk)
  */
object Dedup {

  /** Exact dedup via content hash (X1): one row per distinct content with
    * the smallest id kept and the duplicate count. Uses `sha2` so the
    * shuffle key is a fixed-width digest rather than arbitrary-length text
    * (at 100 TB the digest shuffle is ~32B/row instead of document bytes). */
  def exactByHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Exact dedup keeping the copy from the most-PREFERRED source — the
    * multi-crawl reality: the same page arrives from a curated dump and
    * three crawls, and the pipeline must keep the curated copy, not the
    * lowest id. `priority` lists preferred sources first; unlisted
    * sources rank after every listed one, tie-broken by (source, id) so
    * the choice is total and deterministic.
    *
    * Same single groupBy-on-digest shuffle as [[exactByHash]]: the
    * preference is folded into one `min_by` ordering struct, so choosing
    * differently costs nothing over choosing min-id. Output: one row per
    * distinct content — (content_hash, keep_id, keep_source, dup_cnt). */
  def exactBySourcePriority(
      df: DataFrame,
      textCol: String,
      idCol: String,
      sourceCol: String,
      priority: Seq[String]): DataFrame = {
    val rank = priority.zipWithIndex
      .foldLeft(lit(priority.size)) { case (acc, (s, i)) =>
        when(col(sourceCol) === s, i).otherwise(acc)
      }
    df.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(
        min_by(
          struct(col(idCol).as("id"), col(sourceCol).as("src")),
          struct(rank, col(sourceCol), col(idCol))).as("_keep"),
        count(lit(1)).as("dup_cnt"))
      .select(
        col("content_hash"),
        col("_keep.id").as("keep_id"),
        col("_keep.src").as("keep_source"),
        col("dup_cnt"))
  }

  /** Shingle base hashes: each shingle string is hashed ONCE. Reference
    * (interpreted) form — the hot path uses the fused codegen expression
    * [[graft.functions.MinHashBandKeysExpr]]; a spec asserts they agree. */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => xxhash64(s))

  /** MinHash signature from precomputed base hashes: hash function i is
    * the universal-family mix `a_i * (h & 2^31-1) + b_i` with 31-bit
    * coefficients — the products stay under 2^62 (ANSI-safe, no 64-bit
    * wraparound) and cost one multiply per shingle instead of a string
    * hash. Higher-order lambdas are interpreted, not codegen'd, so
    * per-element cost dominates this operator. */
  def minhashSignature(baseHashCol: Column, numPerm: Int, seed: Long = 42L): Column = {
    val (as, bs) = graft.functions.MinHashSigExpr.coefficients(numPerm, seed)
    // the `% p` reduction is what makes each mix a (near-)random reordering
    // — without it `a*x+b` is monotonic in x and every "permutation" would
    // select the same shingle
    array((0 until numPerm).map(i =>
      array_min(transform(
        baseHashCol,
        h => (h.bitwiseAND(lit(0x7FFFFFFFL)) * lit(as(i)) + lit(bs(i))) % lit(2147483647L)))): _*)
  }

  /** LSH band keys: hash each r-row band of the signature. A pair of docs
    * with Jaccard j collides on a band with probability j^r. Reference
    * (interpreted) form — see [[graft.functions.MinHashBandKeysExpr]]. */
  def bandKeys(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      j => xxhash64(slice(sigCol, j * rowsPerBand + 1, lit(rowsPerBand)), j))

  /** MinHash+LSH candidate pairs with exact-Jaccard verification.
    * Returns (a_id, b_id, jac) for candidate pairs (band-bucket collisions)
    * with jac >= minJaccard, a_id < b_id, deduplicated.
    *
    * Plan shape: shingle+sign (narrow) → posexplode bands (xB rows) →
    * self-join on (band_idx, band_hash) → distinct pair → verify. The only
    * shuffles are the band-bucket join and the pair-distinct — both keyed,
    * both skew-safe under AQE.
    */
  def minhashNearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numPerm: Int = 32,
      bands: Int = 8,
      minJaccard: Double = 0.0): DataFrame = {
    // Shingles live as a DISTINCT HASH SET (array<bigint>, one fused
    // codegen pass — ShingleHashSetExpr) from the start: banding mins over
    // longs, and the Jaccard verify intersects longs, so no shingle string
    // column is ever materialized or shuffled. Identical results modulo
    // 64-bit collisions (~|sh|²/2⁶⁴ per doc).
    val shingled = shingleSets(df, textCol, idCol, shingleSize)
    // Bands carry ONLY (band, doc_id) — shuffling the shingle-hash arrays
    // x bands would multiply the shuffle volume by the band count; the few
    // surviving candidate pairs re-join the hash sets for verification.
    // Signature + band keys are one fused codegen loop over the hash set
    // (no interpreted lambdas, no intermediate signature arrays).
    val banded = bandRows(shingled, numPerm, bands)
    // Pairs form inside each band bucket via collect + double explode —
    // ONE computation of the signatures (a self-join would recompute the
    // whole banding subplan per side) and one shuffle keyed on the band.
    // Degenerate buckets (hash of a near-universal band value) are capped:
    // a bucket of B docs yields B^2/2 candidates, and buckets past the cap
    // carry almost no signal — standard LSH practice.
    val maxBucket = 1000
    val buckets = banded
      .groupBy("band_idx", "band_hash")
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    val candidates = buckets
      .select(explode(col("ids")).as("a_id"), col("ids"))
      .select(col("a_id"), explode(col("ids")).as("b_id"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
    candidates
      .join(shingled.select(col("doc_id").as("a_id"), col("sh").as("sha")), Seq("a_id"))
      .join(shingled.select(col("doc_id").as("b_id"), col("sh").as("shb")), Seq("b_id"))
      .withColumn("jac", round(TextFunctions.jaccard(col("sha"), col("shb")), 6))
      .filter(col("jac") >= minJaccard)
      .select("a_id", "b_id", "jac")
  }

  /** Shingle-hash-set rows for a batch: (doc_id, sh) — the per-doc sketch
    * the verify step intersects. Shared by the one-shot pipeline and the
    * incremental ledger. */
  private def shingleSets(
      df: DataFrame, textCol: String, idCol: String, shingleSize: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= shingleSize)
      .select(
        col("doc_id"),
        graft.functions.ShingleHashSetExpr(col("toks"), shingleSize).as("sh"))

  /** LSH band rows for a batch: (band_idx, band_hash, doc_id). */
  private def bandRows(shingled: DataFrame, numPerm: Int, bands: Int): DataFrame =
    shingled.select(
      col("doc_id"),
      posexplode(graft.functions.MinHashBandKeysFromHashesExpr(col("sh"), numPerm, bands))
        .as(Seq("band_idx", "band_hash")))
      .select("band_idx", "band_hash", "doc_id")

  /** Ledger paths for [[ingestIncrement]]: `bands` accumulates
    * (band_idx, band_hash, doc_id), `sketches` accumulates (doc_id, sh). */
  final case class DedupLedger(bands: String, sketches: String)

  /** Incremental near-dup ingestion — the production shape at 100 TB:
    * each arriving batch is signed ONCE, joined against the persisted
    * band ledger, and appended; the existing corpus is never re-shingled
    * or re-signed. Returns the verified near-dup pairs INVOLVING the new
    * batch: (new × old) ∪ (new × new), with exact Jaccard — across a
    * sequence of increments the union of returned pairs equals the
    * one-shot [[minhashNearDupPairs]] over the full corpus (spec-locked),
    * because band collisions don't care which increment a side arrived
    * in. Caller contract: doc_ids are unique across increments.
    *
    * Plan shape: one keyed shuffle on the band key over ledger ∪ batch
    * (with the same degenerate-bucket cap as the one-shot path, and
    * buckets with no NEW member dropped before pair expansion — all-old
    * buckets were already reported by earlier increments); verification
    * joins only the surviving candidate ids back to the sketch stores.
    * On a real deployment the two ledger tables would be bucketed on
    * their join keys so the per-increment join is exchange-free on the
    * ledger side ([[graft.io.Sinks.bucketedTable]]).
    */
  def ingestIncrement(
      newDocs: DataFrame,
      ledger: DedupLedger,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numPerm: Int = 32,
      bands: Int = 8,
      minJaccard: Double = 0.0,
      maxBucket: Int = 1000): DataFrame = {
    val spark = newDocs.sparkSession
    val newSh = shingleSets(newDocs, textCol, idCol, shingleSize).localCheckpoint()
    val newBands = bandRows(newSh, numPerm, bands).localCheckpoint()
    // First increment: a MISSING ledger path reads as empty. Only that —
    // a corrupt ledger (bad footer, permission error) must propagate,
    // because silently treating it as empty would under-report duplicates
    // forever after (VERDICT r7 item 1).
    def readOr(path: String, empty: DataFrame): DataFrame =
      try spark.read.parquet(path)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition != null && e.getCondition.contains("PATH_NOT_FOUND") =>
          empty
      }
    val oldBands = readOr(ledger.bands, newBands.limit(0))
    val oldSh = readOr(ledger.sketches, newSh.limit(0))
    val tagged = oldBands.withColumn("is_new", lit(false))
      .unionByName(newBands.withColumn("is_new", lit(true)))
    val buckets = tagged
      .groupBy("band_idx", "band_hash")
      .agg(collect_list(struct(col("doc_id"), col("is_new"))).as("ms"))
      .filter(size(col("ms")).between(2, maxBucket))
      .filter(exists(col("ms"), m => m.getField("is_new"))) // all-old: already reported
    val candidates = buckets
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .filter(col("a.is_new") || col("b.is_new"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    val allSh = oldSh.unionByName(newSh)
    val verified = candidates
      .join(allSh.select(col("doc_id").as("a_id"), col("sh").as("sha")), Seq("a_id"))
      .join(allSh.select(col("doc_id").as("b_id"), col("sh").as("shb")), Seq("b_id"))
      .withColumn("jac", round(TextFunctions.jaccard(col("sha"), col("shb")), 6))
      .filter(col("jac") >= minJaccard)
      .select("a_id", "b_id", "jac")
      .localCheckpoint() // materialize BEFORE the appends change the ledger
    newBands.write.mode("append").parquet(ledger.bands)
    newSh.write.mode("append").parquet(ledger.sketches)
    verified
  }

  /** REBUILD the band ledger from a corpus snapshot in one signing pass —
    * the erasure companion of [[ingestIncrement]]: an append-only ledger
    * cannot unlearn a signature, so after deleteWhere + vacuum the only
    * honest ledger is a fresh one over the SURVIVING corpus. OVERWRITES
    * both ledger paths (the old ledger's whole point is to be gone —
    * erased docs' signatures are exactly what must not remain to
    * suppress future content as ghosts); content is identical to a
    * first-increment bootstrap over the same docs (spec-pinned). Returns
    * the number of docs signed. */
  def bootstrapLedger(
      docs: DataFrame,
      ledger: DedupLedger,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numPerm: Int = 32,
      bands: Int = 8): Long = {
    val sh = shingleSets(docs, textCol, idCol, shingleSize).localCheckpoint()
    val n = sh.count()
    bandRows(sh, numPerm, bands).write.mode("overwrite").parquet(ledger.bands)
    sh.write.mode("overwrite").parquet(ledger.sketches)
    n
  }

  /** 64-bit SimHash signatures: per-token xxhash64; each signature bit is
    * the sign of the summed ±1 contributions of that bit across tokens.
    * Computed entirely per-row by the fused codegen expression
    * ([[graft.functions.SimHashSigExpr]]) — no explode, no shuffle. */
  def simhashSignatures(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      graft.functions.SimHashSigExpr(
        transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t))).as("simhash"))

  /** SimHash near-dup candidate pairs via chunk bucketing: split the 64-bit
    * signature into `chunks` pieces; any pair within hamming distance
    * < chunks shares at least one exact chunk (pigeonhole), so the
    * self-join on (chunk_idx, chunk_value) finds all such pairs without a
    * cross product. Returns (a_id, b_id, dist) with dist <= maxDist. */
  def simhashNearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDist: Int = 3,
      chunks: Int = 4): DataFrame = {
    val bitsPerChunk = 64 / chunks
    val sigs = simhashSignatures(df, textCol, idCol)
    val chunked = sigs.select(
      col("doc_id"),
      col("simhash"),
      posexplode(
        array((0 until chunks).map(c =>
          shiftright(col("simhash"), c * bitsPerChunk)
            .bitwiseAND(lit((1L << bitsPerChunk) - 1))): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    val a = chunked.select(
      col("chunk_idx"), col("chunk_val"), col("doc_id").as("a_id"), col("simhash").as("siga"))
    val b = chunked.select(
      col("chunk_idx"), col("chunk_val"), col("doc_id").as("b_id"), col("simhash").as("sigb"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), bit_count(col("siga").bitwiseXOR(col("sigb"))).as("dist"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("dist") <= maxDist)
  }

  /** SPAN-level exact-substring dedup (the Lee et al., ACL'22
    * "Deduplicating Training Data Makes Language Models Better" problem):
    * find, per document, the maximal token spans covered by word
    * `k`-grams that occur ≥ `minOccurrences` times across the corpus —
    * TEMPLATED boilerplate repeated inside otherwise-unique documents,
    * which document-level exact/near dedup cannot see.
    *
    * The published solution is a corpus-wide suffix array — inherently
    * single-machine. The Spark-first re-expression: one pass computes
    * every (doc, pos, k-gram) occurrence; ONE window over the gram key
    * counts occurrences AND elects a global KEEPER occurrence (the
    * lexicographically least (doc, pos)) while keeping every occurrence
    * row in flight — so non-keeper occurrences fall out of the same
    * shuffle, no join back; they then merge into maximal spans with a
    * per-DOC window (never a global one). Cost: O(tokens) rows through
    * two keyed shuffles (gram, then doc) — linear at 100 TB, no suffix
    * array, no driver state. (Measured against the groupBy + join-back +
    * distinct formulation: 2× faster at sf0.1 — the window form shuffles
    * occurrences once instead of three times.)
    *
    * `hashGrams=true` shuffles 8-byte xxhash64 gram keys instead of gram
    * strings (the scale path; a hash collision can only over-flag a span
    * — false positives at ~2^-64 per pair, never a lost keeper).
    * RepeatedSpanSpec pins hash/exact agreement; q137 runs the exact
    * form against a DuckDB oracle.
    *
    * Returns (idCol, span_start, span_end): token positions, end
    * exclusive, spans ≥ k tokens, non-overlapping and maximal per doc. */
  def repeatedSpans(
      df: DataFrame, textCol: String, idCol: String, k: Int,
      minOccurrences: Int = 2, hashGrams: Boolean = true): DataFrame =
    spanArrays(df, textCol, idCol, k, minOccurrences, hashGrams)
      .select(col(idCol), explode(col("__spans")).as("__sp"))
      .select(col(idCol),
        col("__sp.s").as("span_start"), col("__sp.e").as("span_end"))

  /** The per-doc span ARRAYS behind [[repeatedSpans]] — (idCol, __spans:
    * array<struct<s, e>>), docs with no repeated span absent. Kept
    * separate so [[stripRepeatedSpans]] consumes the arrays directly
    * instead of exploding spans only to collect_list them straight back
    * (the r18 shape paid one extra generate + aggregate pair per call). */
  private def spanArrays(
      df: DataFrame, textCol: String, idCol: String, k: Int,
      minOccurrences: Int, hashGrams: Boolean): DataFrame = {
    require(k >= 2, "span k-grams need k >= 2")
    require(minOccurrences >= 2, "a span repeats only at >= 2 occurrences")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= k)
    val gramStr = (i: Column) => concat_ws(" ", slice(col("__toks"), i + 1, lit(k)))
    val gramKey = (i: Column) => if (hashGrams) xxhash64(gramStr(i)) else gramStr(i)
    val grams = toks
      .select(
        col(idCol),
        posexplode(transform(sequence(lit(0), size(col("__toks")) - k), gramKey)))
      .toDF(idCol, "pos", "g")
    // occurrence count + keeper election per gram as WINDOW aggregates:
    // every occurrence stays in flight through the one gram-keyed
    // shuffle, so the non-keepers fall out directly (the groupBy form
    // needs a join back over the full occurrence set plus a distinct —
    // two more full shuffles for the same rows)
    val wg = Window.partitionBy("g")
    val flagged = grams
      .withColumn("__n", count(lit(1)).over(wg))
      .withColumn("__keep", min(struct(col(idCol), col("pos"))).over(wg))
      .filter(col("__n") >= minOccurrences &&
        !(col(idCol) === col("__keep")(idCol) && col("pos") === col("__keep")("pos")))
      .select(col(idCol), col("pos"))
    // classic interval merge, ROW-LOCAL per doc (r19, the ContentChunking
    // pattern): ONE hash aggregate collects each doc's flagged positions,
    // then the merge is an array-expression projection — sorted
    // positions, a new span starts at index i when ps[i] > ps[i-1] + k
    // (touching intervals merge, matching the old window's
    // `pos > prevEnd` with prevEnd = max(pos)+k = ps[i-1]+k under sorted
    // order), span k spans [ps[start_k], ps[nextStart−1] + k). This
    // replaces the doc-keyed WindowExec pair (exchange + sort + running
    // max + running sum) + trailing groupBy with one exchange-compatible
    // aggregate and codegen'd array expressions; duplicate positions
    // (one pos flagged via several grams) sort adjacent and merge into
    // the same span exactly as the running prevEnd did.
    val starts = expr(
      s"""filter(sequence(0, size(__ps) - 1), i ->
         |  i = 0 OR element_at(__ps, i + 1) > element_at(__ps, i) + $k)""".stripMargin)
    val spans = expr(
      s"""transform(__starts, (st, j) -> named_struct(
         |  's', element_at(__ps, st + 1),
         |  'e', element_at(__ps,
         |     IF(j + 1 < size(__starts), element_at(__starts, j + 2), size(__ps))) + $k))"""
        .stripMargin)
    flagged
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("__ps"))
      .withColumn("__starts", starts)
      .select(col(idCol), spans.as("__spans"))
  }

  /** Rewrite documents with their repeated spans REMOVED (keeper
    * occurrences survive, so every repeated k-gram keeps >= 1 copy in the
    * corpus up to span-overlap edge cases — the same approximation the
    * published dedup pipelines ship). Adds `cleaned` (the stripped text)
    * and `spans_removed`; documents without repeats pass through intact.
    * The span list joins back grouped per doc (bounded by doc length),
    * and token filtering is a narrow per-row expression. */
  def stripRepeatedSpans(
      df: DataFrame, textCol: String, idCol: String, k: Int,
      minOccurrences: Int = 2, hashGrams: Boolean = true): DataFrame = {
    val spans = spanArrays(df, textCol, idCol, k, minOccurrences, hashGrams)
    val toksIdx = transform(
      TextFunctions.tokens(col(textCol)),
      (t, i) => struct(t.as("t"), i.as("i")))
    val kept = filter(
      toksIdx,
      x => !exists(
        col("__spans"),
        sp => x.getField("i") >= sp.getField("s") && x.getField("i") < sp.getField("e")))
    df.join(spans, Seq(idCol), "left")
      .withColumn("spans_removed", coalesce(size(col("__spans")), lit(0)))
      .withColumn(
        "cleaned",
        when(col("__spans").isNull, col(textCol))
          .otherwise(array_join(transform(kept, _.getField("t")), " ")))
      .drop("__spans")
  }
}
