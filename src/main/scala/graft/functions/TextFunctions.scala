package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis builders for the LLM-data-pipeline surface (SURVEY.md §2.11
  * X4): tokenization, token-count estimation, language-ID heuristic, quality
  * scoring, and a rolling-hash document fingerprint. All pure Catalyst
  * expression compositions — codegen'd, no UDFs, distributed per-row.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: runs of letters, runs of digits, or single
    * other non-space characters — a cheap proxy for subword token counts. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Stopword-marker language-ID heuristic. Priority-ordered marker words
    * (an n-gram/stopword heuristic in the spirit of fastText-style
    * shortlists; the fixture vocabulary is synthetic, so markers are drawn
    * from it — the shape of the operator is what matters at scale). */
  def langId(text: Column): Column = {
    val t = tokens(text)
    when(array_contains(t, "the"), "en")
      .when(array_contains(t, "data"), "de")
      .when(array_contains(t, "query"), "fr")
      .when(array_contains(t, "join"), "es")
      .otherwise("zh")
  }

  /** Type-token ratio: distinct tokens / tokens. */
  def typeTokenRatio(text: Column): Column = {
    val t = tokens(text)
    size(array_distinct(t)).cast("double") / size(t)
  }

  /** Quality score in [0,1]: lexical diversity damped by a length prior
    * (short docs score low). Deterministic, SQL-expressible. */
  def qualityScore(text: Column): Column =
    typeTokenRatio(text) * least(lit(1.0), tokenCount(text).cast("double") / 200.0)

  /** Punctuation ratio: characters outside [a-z0-9 ] over total characters
    * (fixture text is lowercase); 0 for empty text. One regexp pass. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(text, lit("[^a-z0-9 ]"), lit(0))).cast("double") / length(text))

  /** Stopword ratio: fraction of tokens that are function words. The list
    * is a Column-level literal array, so membership is evaluated per token
    * without a join; counts multiplicity (unlike an intersect). */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    size(filter(t, tok => array_contains(sw, tok))).cast("double") / size(t)
  }

  /** Mean token length: letters-only length / token count (no per-token
    * loop — one REPLACE strips the separators). */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / tokenCount(text)

  /** Rolling polynomial hash over the character stream:
    * `h = (h*31 + code(c)) mod 1e9+7`, left fold from 0. Stable across
    * engines (pure integer arithmetic, no engine-specific hash). Empty
    * text is 0 explicitly — `sequence(1, 0)` would step backwards. */
  /** Unicode canonical form for dedup keys ([[CanonicalTextExpr]]):
    * NFC → casefold → whitespace-to-space → keep letters/numbers/space →
    * collapse runs → trim. Canonical bytes are oracle-pinned (q122). */
  def canonicalText(text: Column): Column = CanonicalTextExpr(text)

  def fingerprint(text: Column): Column =
    when(length(text) === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1)))),
        lit(0L),
        (acc, c) => (acc * 31 + c) % 1000000007L))

  /** Word n-gram shingles (distinct), for MinHash / Jaccard dedup.
    * Callers must filter docs with fewer than `n` tokens. */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Duplicate n-gram fraction (the Gopher-style repetition signal):
    * 1 - distinct_ngrams / ngram_positions over word n-grams, 0 for docs
    * with fewer than `n` tokens. High values flag boilerplate/templated
    * text that a quality gate drops before training. Per-row expression
    * composition — no shuffle. */
  def dupNgramFrac(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val total = size(toks) - (n - 1)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    when(total <= 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(grams)).cast("double") / total)
  }

  /** Fraction of n-gram positions occupied by the single MOST FREQUENT
    * n-gram — the Gopher/MassiveText "fraction in most common n-gram"
    * repetition signal (Rae et al. 2021 Table A1), token form. 0 when the
    * doc has fewer than n tokens. Row-local O(g²) nested-lambda count
    * with g bounded by doc length — pure projection, no shuffle, stays in
    * codegen next to the other quality signals. The quadratic is PER ROW:
    * fine to ~1k-token docs (10⁶ cheap comparisons); for book-length
    * documents switch to the exploded (doc, gram)-keyed aggregate form
    * (one shuffle, linear work — the q87/q125 shape). */
  def topNgramFrac(text: Column, n: Int): Column = {
    require(n >= 1, "n-gram order must be >= 1")
    val toks = tokens(text)
    val grams =
      if (n == 1) toks
      else transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    val counts = transform(array_distinct(grams), g => size(filter(grams, y => y === g)))
    when(size(toks) < n, lit(0.0))
      .otherwise(array_max(counts).cast("double") / size(grams))
  }

  /** Exact Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Asymmetric containment |A∩B| / |A| — the subset-duplicate signal
    * Jaccard misses: a short document quoted whole inside a much longer
    * one scores near 1 here while its Jaccard stays near |A|/|B| ≈ 0.
    * The standard second axis of near-dup detection (Broder's
    * containment, the measure superset-dedup pipelines threshold). */
  def containment(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(a)

  /** Sliding token-window chunks: windows of `chunkTokens` tokens starting
    * every `stride` tokens (the standard context-window chunking of a
    * training-data pipeline). Returns an array of chunk strings; the tail
    * window may be shorter than `chunkTokens` but always covers the final
    * tokens. */
  def chunks(toks: Column, chunkTokens: Int, stride: Int): Column = {
    require(chunkTokens > 0 && stride > 0,
      s"chunks needs positive chunkTokens/stride, got $chunkTokens/$stride")
    transform(
      sequence(lit(0), greatest(ceil((size(toks) - chunkTokens).cast("double") / stride).cast("int"), lit(0))),
      w => concat_ws(" ", slice(toks, w * stride + 1, lit(chunkTokens))))
  }

  // --- PII scrubbing (the pre-training privacy pass) -------------------
  // Patterns stick to syntax BOTH regex engines (Java here, RE2 in the
  // DuckDB oracle) interpret identically: explicit classes, no lookaround.

  /** Email addresses. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded; syntactic match, no octet range
    * check — triage semantics). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Replace emails/IPv4s with typed placeholder tags. Emails first:
    * an address can contain a dotted quad, the reverse cannot. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")

  /** Count of email / IPv4 matches (codegen'd `regexp_count`). */
  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Re))
}
