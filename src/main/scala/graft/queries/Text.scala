package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.core.Fmt.{r4, r6}
import graft.functions.TextFunctions
import graft.ops.{ConnectedComponents, Dedup, Multimodal, TfIdf}

/** Text-analysis + dedup + multimodal queries over the `documents` table
  * (SURVEY.md §2.11 X1/X2/X4/X5 — the training-data-pipeline surface).
  */
object Text {

  /** Q22 — per-language exact-dup stats (declared §2.13 Q22: COUNT DISTINCT
    * on content, engine-internal hashing kept out of the oracle).
    *
    * At-scale note: `countDistinct(col("text"))` shuffles raw document
    * bytes as the distinct key — kept here only because the declared Q22
    * contract requires the oracle to see the text itself. The
    * engine-native form at 100 TB is
    * `countDistinct(sha2(col("text"), 256))`: a 32-byte shuffle key,
    * identical counts barring a SHA-256 collision (same digest trick as
    * [[Dedup.exactByHash]], plan-asserted in PlanShapeSpec q26). */
  val q22 = QueryDef(
    "q22_text_dedup_stats",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), countDistinct(col("text")).as("uniq"))
        .orderBy("lang"),
    Some("""SELECT lang, COUNT(*) AS n, COUNT(DISTINCT text) AS uniq
            FROM documents GROUP BY lang ORDER BY lang"""))

  /** Q26 — exact dedup via content hash (X1; see [[Dedup.exactByHash]]).
    * The oracle groups by raw text — identical result barring a SHA-256
    * collision. */
  val q26 = QueryDef(
    "q26_dedup_exact",
    (s, d) =>
      Dedup.exactByHash(Tables.documents(s, d), "text", "doc_id")
        .select("keep_id", "dup_cnt")
        .orderBy("keep_id"),
    Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt
            FROM documents GROUP BY text ORDER BY keep_id"""),
    headline = true)

  /** Q27 — MinHash+LSH near-dup candidates (X2): shingle → 32-perm
    * signature → 8 bands → bucket join → exact-Jaccard verify. Engine-only
    * (xxhash64 signatures are not portable SQL) → rows-only check; the
    * ScalaTest spec asserts candidate recall against q29's exact pairs. */
  val q27 = QueryDef(
    "q27_dedup_minhash",
    (s, d) =>
      Dedup.minhashNearDupPairs(Tables.documents(s, d), "text", "doc_id")
        .orderBy("a_id", "b_id"),
    None,
    headline = true)

  /** Q28 — SimHash near-dup candidates (X2): 64-bit signatures, chunk
    * bucketing (pigeonhole candidates), hamming <= 16. Engine-only. */
  val q28 = QueryDef(
    "q28_dedup_simhash",
    (s, d) =>
      Dedup.simhashNearDupPairs(Tables.documents(s, d), "text", "doc_id", maxDist = 16)
        .orderBy("a_id", "b_id"),
    None)

  /** Q29 — exact word-3-gram Jaccard top-5 per probe doc (X2 baseline/
    * verifier for q27). Probes are a FIXED-SIZE set (the 20 lowest
    * doc_ids), not a fraction of the corpus: a proportional probe set
    * (`doc_id % 100`) makes exact verification O(n²/100) as the corpus
    * grows, while a constant cap keeps it O(n) — one broadcast of 20
    * shingle sets against the scan (VERDICT r1 item 3). */
  val q29 = QueryDef(
    "q29_ngram_jaccard",
    (s, d) => {
      val shingled = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), TextFunctions.shingles(col("toks"), 3).as("sh"))
      val probes = shingled
        .orderBy("doc_id").limit(20)
        .select(col("doc_id").as("a_id"), col("sh").as("sha"))
      val pairs = shingled
        .join(broadcast(probes), col("doc_id") =!= col("a_id"))
        .select(
          col("a_id"),
          col("doc_id").as("b_id"),
          r6(TextFunctions.jaccard(col("sha"), col("sh"))).as("jac"))
      import org.apache.spark.sql.expressions.Window
      pairs
        .withColumn(
          "rn",
          row_number().over(
            Window.partitionBy("a_id").orderBy(col("jac").desc, col("b_id"))))
        .filter(col("rn") <= 5)
        .select("a_id", "b_id", "jac")
        .orderBy("a_id", "b_id")
    },
    Some("""WITH dd AS (SELECT doc_id, str_split(text,' ') AS toks FROM documents),
                 sh AS (SELECT doc_id,
                               list_distinct([array_to_string(toks[i:i+2], ' ')
                                              FOR i IN range(1, len(toks)-1)]) AS sh
                        FROM dd WHERE len(toks) >= 3),
                 p AS (SELECT doc_id AS a_id, sh AS sha FROM sh ORDER BY doc_id LIMIT 20),
                 j AS (SELECT a_id, sh.doc_id AS b_id,
                              ROUND(CAST(len(list_intersect(sha, sh.sh)) AS DOUBLE)
                                    / len(list_distinct(sha || sh.sh)), 6) AS jac
                       FROM p JOIN sh ON sh.doc_id <> a_id),
                 r AS (SELECT a_id, b_id, jac,
                              ROW_NUMBER() OVER (PARTITION BY a_id
                                                 ORDER BY jac DESC, b_id) AS rn
                       FROM j)
            SELECT a_id, b_id, jac FROM r WHERE rn <= 5 ORDER BY a_id, b_id"""))

  /** Q33 — language-ID heuristic vs labeled lang (X4). */
  val q33 = QueryDef(
    "q33_lang_id",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), TextFunctions.langId(col("text")).as("pred"))
        .groupBy("lang", "pred")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "pred"),
    Some("""SELECT lang,
                   CASE WHEN list_contains(str_split(text,' '), 'the') THEN 'en'
                        WHEN list_contains(str_split(text,' '), 'data') THEN 'de'
                        WHEN list_contains(str_split(text,' '), 'query') THEN 'fr'
                        WHEN list_contains(str_split(text,' '), 'join') THEN 'es'
                        ELSE 'zh' END AS pred,
                   COUNT(*) AS cnt
            FROM documents GROUP BY 1,2 ORDER BY 1,2"""))

  /** Q34 — quality scoring: type-token ratio damped by a length prior (X4). */
  val q34 = QueryDef(
    "q34_text_quality",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          r6(TextFunctions.typeTokenRatio(col("text"))).as("ttr"),
          r6(TextFunctions.qualityScore(col("text"))).as("score"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST(len(str_split(text,' ')) AS INTEGER) AS n_tokens,
                   ROUND(CAST(len(list_distinct(str_split(text,' '))) AS DOUBLE)
                         / len(str_split(text,' ')), 6) AS ttr,
                   ROUND(CAST(len(list_distinct(str_split(text,' '))) AS DOUBLE)
                         / len(str_split(text,' '))
                         * LEAST(1.0, len(str_split(text,' ')) / 200.0), 6) AS score
            FROM documents ORDER BY doc_id"""))

  /** Q35 — token counting: whitespace + BPE-ish regex estimate (X4). */
  val q35 = QueryDef(
    "q35_token_count",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_ws_tokens"),
          TextFunctions.bpeishCount(col("text")).as("n_bpeish"),
          length(col("text")).as("n_chars_actual"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST(len(str_split(text,' ')) AS INTEGER) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpeish,
                   CAST(LENGTH(text) AS INTEGER) AS n_chars_actual
            FROM documents ORDER BY doc_id"""))

  /** Q36 — rolling-hash document fingerprint (X4): pure-arithmetic
    * polynomial hash, portable across engines (unlike xxhash64). */
  val q36 = QueryDef(
    "q36_fingerprint",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CASE WHEN LENGTH(text) = 0 THEN 0 ELSE
                     list_reduce(list_transform(range(1, LENGTH(text)+1),
                                                i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)),
                                 (a, b) -> (a*31 + b) % 1000000007) END AS fp
            FROM documents ORDER BY doc_id"""))

  /** Q37 — multimodal feature extraction (X5): binary payload column →
    * mapPartitions batch extraction through the REAL container parsers
    * (PNG with CRC-validated IHDR / BMP — format-sniffed, see
    * [[Multimodal.extractFeatures]]). The oracle restates the container
    * ground truth from the payload byte length (`octet_length(encode(…))`
    * — byte-exact, no ASCII assumption): PNG container = 57 + n bytes
    * (signature 8 + IHDR 25 + IDAT 12+n + IEND 12), BMP = 54 + n, so a
    * parser bug (wrong offset, endianness, CRC) hash-fails. */
  val q37 = QueryDef(
    "q37_multimodal_features",
    (s, d) => {
      val media = Multimodal.imagesFromDocuments(s, Tables.documents(s, d))
      Multimodal.extractFeatures(s, media).toDF().orderBy("doc_id")
    },
    Some("""WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
                   CAST(CASE WHEN doc_id % 2 = 0 THEN 57 + n ELSE 54 + n END
                        AS INTEGER) AS n_bytes,
                   CAST(1 + n % 512 AS INTEGER) AS width,
                   CAST(1 + (n * 7) % 384 AS INTEGER) AS height,
                   CAST(CASE WHEN doc_id % 2 = 0
                             THEN CASE WHEN n % 2 = 0 THEN 3 ELSE 4 END
                             ELSE 3 END AS INTEGER) AS channels
            FROM p ORDER BY doc_id"""))

  /** Q73 — document chunking (X4/training-pipeline core): sliding
    * 50-token windows, stride 25, one row per chunk. Chunk text travels as
    * an md5 digest to keep the verification output narrow. */
  val q73 = QueryDef(
    "q73_doc_chunking",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          posexplode(TextFunctions.chunks(TextFunctions.tokens(col("text")), 50, 25))
            .as(Seq("chunk_idx", "chunk")))
        .select(
          col("doc_id"),
          col("chunk_idx"),
          TextFunctions.tokenCount(col("chunk")).as("n_chunk_tokens"),
          md5(col("chunk")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx"),
    Some("""WITH d AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
                 c AS (SELECT doc_id,
                              unnest([{'w': w, 'chunk': array_to_string(toks[(w*25+1):(w*25+50)], ' ')}
                                      FOR w IN range(0, CAST(GREATEST(ceil((len(toks)-50)/25.0), 0) AS BIGINT)+1)]) AS s
                       FROM d)
            SELECT doc_id, CAST(s.w AS INTEGER) AS chunk_idx,
                   CAST(len(str_split(s.chunk, ' ')) AS INTEGER) AS n_chunk_tokens,
                   md5(s.chunk) AS chunk_md5
            FROM c ORDER BY doc_id, chunk_idx"""))

  /** Q74 — composed corpus-cleaning pipeline (the end-to-end shape a
    * training-data user runs): length gate + lexical-diversity gate +
    * exact dedup keeping the smallest doc_id, emitting survivors with
    * their quality score. */
  val q74 = QueryDef(
    "q74_corpus_clean",
    (s, d) =>
      graft.ops.Corpus.clean(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"), r6(TextFunctions.qualityScore(col("text"))).as("score"))
        .orderBy("doc_id"),
    Some("""WITH gated AS (
              SELECT doc_id, lang, text,
                     len(str_split(text,' ')) AS n_tok,
                     CAST(len(list_distinct(str_split(text,' '))) AS DOUBLE)
                       / len(str_split(text,' ')) AS ttr
              FROM documents
              WHERE len(str_split(text,' ')) BETWEEN 30 AND 400
                AND CAST(len(list_distinct(str_split(text,' '))) AS DOUBLE)
                      / len(str_split(text,' ')) > 0.4),
                 keep AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY text)
            SELECT g.doc_id, g.lang,
                   ROUND(g.ttr * LEAST(1.0, g.n_tok / 200.0), 6) AS score
            FROM gated g SEMI JOIN keep k ON g.doc_id = k.doc_id
            ORDER BY g.doc_id"""))

  /** Q80 — extended quality signals (X4: the length/punctuation/stopword
    * ratio family a filtering pipeline thresholds on). All per-row
    * expression compositions — no shuffle until the final sort. */
  val q80 = QueryDef(
    "q80_quality_signals",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          r6(TextFunctions.punctRatio(col("text"))).as("punct_ratio"),
          r6(TextFunctions.stopwordRatio(col("text"))).as("stop_ratio"),
          r6(TextFunctions.meanTokenLen(col("text"))).as("mean_tok_len"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   ROUND(CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE
                     CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
                       / LENGTH(text) END, 6) AS punct_ratio,
                   ROUND(CAST(len(list_filter(str_split(text, ' '),
                       t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
                       AS DOUBLE) / len(str_split(text, ' ')), 6) AS stop_ratio,
                   ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                       / len(str_split(text, ' ')), 6) AS mean_tok_len
            FROM documents ORDER BY doc_id"""))

  /** Q83 — the injected SQL surface (SURVEY §4 extension point): the text
    * signals run through `spark.sql` names registered by
    * [[graft.GraftExtensions]] (not the Scala API, not a per-session
    * Registry call), proving a SQL-only user reaches the same engine
    * functions. Results must equal the Column-API queries (q35/q36), which
    * the shared oracle forms assert. */
  val q83 = QueryDef(
    "q83_extension_sql",
    (s, d) => {
      Tables.registerFixtures(s, d)
      s.sql("""SELECT doc_id,
                      graft_token_count(text) AS n_tokens,
                      graft_fingerprint(text) AS fp,
                      graft_lang_id(text) AS pred
               FROM documents ORDER BY doc_id""")
    },
    Some("""SELECT doc_id,
                   CAST(len(str_split(text,' ')) AS INTEGER) AS n_tokens,
                   CASE WHEN LENGTH(text) = 0 THEN 0 ELSE
                     list_reduce(list_transform(range(1, LENGTH(text)+1),
                                                i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)),
                                 (a, b) -> (a*31 + b) % 1000000007) END AS fp,
                   CASE WHEN list_contains(str_split(text,' '), 'the') THEN 'en'
                        WHEN list_contains(str_split(text,' '), 'data') THEN 'de'
                        WHEN list_contains(str_split(text,' '), 'query') THEN 'fr'
                        WHEN list_contains(str_split(text,' '), 'join') THEN 'es'
                        ELSE 'zh' END AS pred
            FROM documents ORDER BY doc_id"""))

  /** Q84 — real container metadata (X5 upgraded past the stub): payloads
    * are wrapped as genuine RIFF/WAVE files and the engine PARSES the
    * binary header back (magics validated, little-endian fields read).
    * The oracle states the ground-truth parameters from the payload
    * length, so a parser bug (wrong offset, wrong endianness) hash-fails.
    * This is the 100 TB triage shape: container-level validate+read
    * before any expensive decode. */
  val q84 = QueryDef(
    "q84_wav_metadata",
    (s, d) => {
      val wav = Multimodal.wavFromDocuments(s, Tables.documents(s, d))
      Multimodal.wavMetadata(s, wav).toDF().orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   CAST(16000 AS INTEGER) AS sample_rate,
                   CAST(1 AS INTEGER) AS channels,
                   CAST(16 AS INTEGER) AS bits_per_sample,
                   CAST(LENGTH(text) + LENGTH(text) % 2 AS INTEGER) AS data_bytes,
                   CAST((LENGTH(text) + LENGTH(text) % 2) // 2 AS INTEGER) AS n_samples,
                   CAST(((LENGTH(text) + LENGTH(text) % 2) // 2) * 1000 // 16000 AS BIGINT) AS duration_ms
            FROM documents ORDER BY doc_id"""))

  /** Q113 — PCM signal features (X5, one step past q84's container
    * triage): decode each WAV data chunk as little-endian int16 samples
    * and fold peak / mean / RMS in one pass ([[Multimodal.audioFeatures]])
    * — the loudness/energy screen run before an expensive model stage.
    * The op returns exact integer sums; the float features derive as
    * columns, so the oracle recomputes the identical expression from the
    * text char codes (fixture text is ASCII, so char code == payload
    * byte; the odd-length pad byte is 0, which ascii('')=0 mirrors). */
  val q113 = QueryDef(
    "q113_audio_features",
    (s, d) => {
      val wav = Multimodal.wavFromDocuments(s, Tables.documents(s, d))
      Multimodal.audioFeatures(s, wav).toDF()
        .select(
          col("doc_id"), col("n_samples"), col("peak"), col("sum_s"), col("sum_sq"),
          r4(sqrt(col("sum_sq").cast("double") / col("n_samples"))).as("rms"),
          r4(col("sum_s").cast("double") / col("n_samples")).as("mean"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, text, LENGTH(text) AS nb FROM documents WHERE LENGTH(text) > 0),
                 s AS (SELECT doc_id,
                              ascii(substr(text, CAST(2*u.i+1 AS INT), 1))
                            + 256 * ascii(substr(text, CAST(2*u.i+2 AS INT), 1)) AS v
                       FROM d, UNNEST(range(0, (nb + 1) // 2)) u(i)),
                 a AS (SELECT doc_id,
                              CAST(COUNT(*) AS INTEGER) AS n_samples,
                              CAST(MAX(ABS(v)) AS INTEGER) AS peak,
                              CAST(SUM(v) AS BIGINT) AS sum_s,
                              CAST(SUM(v * v) AS BIGINT) AS sum_sq
                       FROM s GROUP BY doc_id)
            SELECT doc_id, n_samples, peak, sum_s, sum_sq,
                   ROUND(SQRT(CAST(sum_sq AS DOUBLE) / n_samples), 4) AS rms,
                   ROUND(CAST(sum_s AS DOUBLE) / n_samples, 4) AS mean
            FROM a ORDER BY doc_id"""))

  /** Q85 — frame sampling (X5): every 3rd 100-byte frame of each WAV data
    * chunk, with per-frame byte checksums — the video/audio "sample
    * frames, don't decode" op as pure byte slicing. The oracle recomputes
    * each sampled slice from the text characters (the trailing pad byte
    * is 0, so it changes n_bytes but never a checksum). */
  val q85 = QueryDef(
    "q85_frame_sample",
    (s, d) => {
      val wav = Multimodal.wavFromDocuments(s, Tables.documents(s, d))
      Multimodal.sampleFrames(s, wav, frameBytes = 100, everyK = 3)
        .toDF().orderBy("doc_id", "frame_idx")
    },
    Some("""WITH p AS (
              SELECT doc_id, text, LENGTH(text) AS n,
                     LENGTH(text) + LENGTH(text) % 2 AS db
              FROM documents),
            f AS (
              SELECT doc_id, text, n, db,
                     UNNEST(range(0, (db + 99) // 100, 3)) AS fi
              FROM p)
            SELECT doc_id,
                   CAST(fi AS INTEGER) AS frame_idx,
                   CAST(LEAST(100, db - fi*100) AS INTEGER) AS n_bytes,
                   CAST(COALESCE(list_sum(list_transform(
                          range(1, GREATEST(LEAST(100, n - fi*100), 0) + 1),
                          i -> ascii(substr(text, CAST(fi*100 + i AS INTEGER), 1)))), 0) % 997
                        AS BIGINT) AS checksum
            FROM f ORDER BY doc_id, frame_idx"""))

  /** Q101 — image-container metadata (X5, VERDICT r2 item 8): a mixed
    * PNG/BMP corpus (even doc_ids wrap as PNG with a CRC-validated IHDR,
    * odd as BMP) goes through format-sniffing header triage —
    * [[Multimodal.imageMetadata]] — the same mapPartitions batch shape as
    * the WAV parser (q84). Dimensions are a pure function of payload
    * size, so the oracle recomputes them from LENGTH(text). */
  val q101 = QueryDef(
    "q101_image_metadata",
    (s, d) => {
      val imgs = Multimodal.imagesFromDocuments(s, Tables.documents(s, d))
      Multimodal.imageMetadata(s, imgs).toDF().orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
                   CAST(1 + LENGTH(text) % 512 AS INTEGER) AS width,
                   CAST(1 + (LENGTH(text) * 7) % 384 AS INTEGER) AS height,
                   CAST(8 AS INTEGER) AS bit_depth,
                   CAST(CASE WHEN doc_id % 2 = 0
                             THEN CASE WHEN LENGTH(text) % 2 = 0 THEN 3 ELSE 4 END
                             ELSE 3 END AS INTEGER) AS channels
            FROM documents ORDER BY doc_id"""))

  /** Q86 — TF-IDF top terms per document (X4; see [[TfIdf]] for the
    * shuffle budget). Scores are rounded AFTER ranking, so the rank
    * tie-break (raw score desc, then term) is identical on both engines. */
  val q86 = QueryDef(
    "q86_tfidf_top_terms",
    (s, d) =>
      TfIdf.topTerms(Tables.documents(s, d), k = 3)
        .select(col("doc_id"), col("term"), r6(col("tfidf")).as("tfidf"), col("rk"))
        .orderBy("doc_id", "rk"),
    Some("""WITH tok AS (SELECT doc_id, UNNEST(str_split(text, ' ')) AS term FROM documents),
                 tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
                 df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
                 n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
                 scored AS (
                   SELECT t.doc_id, t.term, t.tf * LN(n.n / d.df) AS s
                   FROM tf t JOIN df d USING (term) CROSS JOIN n),
                 ranked AS (
                   SELECT doc_id, term, s,
                          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS rk
                   FROM scored)
            SELECT doc_id, term, ROUND(s, 6) AS tfidf, CAST(rk AS INTEGER) AS rk
            FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk"""))

  /** Q87 — repetition signal (X4): duplicate-trigram fraction, the
    * Gopher-style boilerplate detector. Pure per-row expressions; the
    * histogram-style rollup by bucket keeps the output stable and small. */
  val q87 = QueryDef(
    "q87_repetition",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          r6(TextFunctions.dupNgramFrac(col("text"), 3)).as("dup3"))
        .orderBy("doc_id"),
    Some("""WITH g AS (
              SELECT doc_id, str_split(text, ' ') AS toks, len(str_split(text, ' ')) AS L
              FROM documents)
            SELECT doc_id,
                   CASE WHEN L - 2 <= 0 THEN 0.0 ELSE
                     ROUND(1.0 - CAST(len(list_distinct(list_transform(range(1, L - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS DOUBLE)
                       / (L - 2), 6) END AS dup3
            FROM g ORDER BY doc_id"""))

  /** Q88 — duplicate-group clustering (X2): candidate PAIRS become
    * duplicate GROUPS via distributed connected components
    * ([[ConnectedComponents]]). Candidate edges come from rare-shingle
    * blocking — two docs sharing a trigram whose corpus-wide document
    * frequency is exactly 2 — a deterministic blocking scheme (unlike
    * LSH, whose recall misses make an exact oracle impossible). A df==2
    * shingle's bucket IS its one edge, so edges fall out of a single
    * keyed aggregation — explode hashed shingles → groupBy → size-2
    * buckets → (min, max) pair — with no df-count join and no self-join.
    * Shingles travel as 64-bit hashes ([[graft.functions
    * .ShingleHashSetExpr]]: per-doc distinct, so bucket size = document
    * frequency), not strings. The oracle rebuilds the same edges in SQL
    * and closes them with a recursive CTE, so a propagation bug — wrong
    * join side, missed round, bad convergence test — hash-fails. */
  val q88 = QueryDef(
    "q88_dedup_components",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .filter(TextFunctions.tokenCount(col("text")) >= 3)
      val sh = docs.select(
        col("doc_id"),
        explode(graft.functions.ShingleHashSetExpr(
          TextFunctions.tokens(col("text")), 3)).as("h"))
      // count/min/max, NOT collect_list: ShingleHashSetExpr is per-doc
      // distinct, so a df==2 bucket holds exactly two distinct docs and
      // (min, max) IS the ordered pair — three scalar aggregates stay in
      // whole-stage codegen HashAggregate, where collect_list forces
      // ObjectHashAggregate with per-bucket array buffers.
      val edges = sh.groupBy("h").agg(
        count(lit(1)).as("df"),
        min(col("doc_id")).as("src"),
        max(col("doc_id")).as("dst"))
        .filter(col("df") === 2)
        .select("src", "dst")
        .distinct()
      val (labels, _) = ConnectedComponents.label(edges)
      labels.select(col("id").as("doc_id"), col("comp")).orderBy("doc_id")
    },
    Some("""WITH RECURSIVE
              tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents
                      WHERE len(str_split(text, ' ')) >= 3),
              sh AS (SELECT DISTINCT doc_id, s FROM (
                       SELECT doc_id,
                              UNNEST(list_transform(range(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
                       FROM tok)),
              rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) = 2),
              edges AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
                        FROM sh a JOIN rare USING (s) JOIN sh b USING (s)
                        WHERE a.doc_id < b.doc_id),
              sym AS (SELECT src, dst FROM edges
                      UNION SELECT dst AS src, src AS dst FROM edges),
              reach(a, b) AS (SELECT src, dst FROM sym
                              UNION
                              SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
              comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a)
            SELECT doc_id, comp FROM comp ORDER BY doc_id"""),
    headline = true)

  /** Q106 — DataSource V2 scan (SURVEY §4's last unexercised extension
    * rung): the documents corpus materialized as real PNG/BMP container
    * files, read back through `spark.read.format("graft-media")`. The
    * `format = 'png'` filter is pushed into the source and prunes BMP
    * files at PLANNING time (never opened); dropping `media` from the
    * projection makes the source read only 64-byte header prefixes. The
    * oracle restates the container ground truth byte-exactly from the
    * text payload, same formulas as q37 (PNG = 57+n bytes, dims from
    * [[graft.ops.Multimodal.toPng]]). */
  val q106 = QueryDef(
    "q106_media_source_scan",
    (s, d) => {
      val dir = graft.sources.MediaFixture.ensure(s, d)
      s.read.format("graft-media").load(dir)
        .filter(col("format") === "png")
        .select("doc_id", "format", "width", "height", "channels", "n_bytes")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, 'png' AS format,
                   CAST(1 + octet_length(encode(text)) % 512 AS INTEGER) AS width,
                   CAST(1 + (octet_length(encode(text)) * 7) % 384 AS INTEGER) AS height,
                   CAST(CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 3 ELSE 4 END
                        AS INTEGER) AS channels,
                   CAST(57 + octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id"""))

  /** Q108 — image resize (X5's last brief item): per-doc 24bpp BMP raster
    * (dims derived from the text byte length), nearest-neighbor resample
    * to 4x4 through [[Multimodal.resizeBmpNearest]], then a pixel-sum
    * checksum. Every step is deterministic byte arithmetic, so the oracle
    * recomputes the RESIZED pixels directly from the nearest-neighbor
    * coordinate mapping (sx = x*w//4, sy = y*h//4) and the raster's pixel
    * function — a resampling bug (wrong rounding, row padding, channel
    * order) shifts the checksum and hash-fails. */
  val q108 = QueryDef(
    "q108_image_resize",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), octet_length(col("text").cast("binary")).as("n"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, n) =>
          val w = 1 + n % 16
          val h = 1 + n % 8
          val resized = Multimodal.resizeBmpNearest(Multimodal.toBmpRaster(w, h), 4, 4)
            .getOrElse(sys.error(s"raster for doc $id failed to resize"))
          var cs = 0L
          var i = 0
          while (i < 16) {
            val o = 54 + (i / 4) * 12 + 3 * (i % 4) // dstRow = 12B, no padding at w=4
            cs += (resized(o) & 0xff) + (resized(o + 1) & 0xff) + (resized(o + 2) & 0xff)
            i += 1
          }
          (id, w, h, cs)
        })
        .toDF("doc_id", "width", "height", "checksum")
        .orderBy("doc_id")
    },
    Some("""WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
                 d AS (SELECT doc_id, 1 + n % 16 AS w, 1 + n % 8 AS h FROM p)
            SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
                   CAST(list_sum([ ((i % 4) * w // 4 * 7 + (i // 4) * h // 4 * 13) % 256
                                 + ((i % 4) * w // 4 * 31 + (i // 4) * h // 4) % 256
                                 + ((i % 4) * w // 4 + (i // 4) * h // 4 * 57) % 256
                                   FOR i IN range(0, 16) ]) AS BIGINT) AS checksum
            FROM d ORDER BY doc_id"""))

  /** Q112 — heavy hitters via bounded-memory candidates + exact verify
    * ([[graft.ops.HeavyHitters]]): Misra-Gries summaries (O(k) state per
    * partition, never one row per distinct key) nominate ≤ k candidate
    * tokens, one broadcast-semi-join counting pass makes the result exact
    * and deterministic. The oracle is the plain exact top-10 — it matches
    * whenever the true top-10 clear the n/(k+1) survival bound (k=50
    * comfortably covers the fixture; HeavyHittersSpec exercises real
    * eviction + the bound on a seeded Zipf corpus). */
  val q112 = QueryDef(
    "q112_heavy_hitters",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
      graft.ops.HeavyHitters.topExact(toks, col("tok"), k = 50, n = 10)
    },
    Some("""WITH w AS (SELECT UNNEST(str_split(text, ' ')) AS key FROM documents)
            SELECT key, COUNT(*) AS cnt FROM w
            GROUP BY key ORDER BY cnt DESC, key LIMIT 10"""),
    headline = true)

  /** Q114 — fuzzy self-join ([[graft.ops.FuzzyJoin]]): all supplier-name
    * pairs within edit distance 1, found by deletion-neighborhood
    * blocking + levenshtein verify — never a cross product. The blocking
    * is complete for d ≤ 1, so the brute-force SQL oracle (fine at
    * oracle scale, impossible at 100 TB) must match exactly; a recall
    * bug in the variant generation loses pairs and hash-fails. */
  val q114 = QueryDef(
    "q114_fuzzy_join",
    (s, d) =>
      graft.ops.FuzzyJoin.editDistance1Pairs(
        Tables.supplier(s, d), "s_suppkey", "s_name")
        .orderBy("a_k", "b_k"),
    Some("""WITH s AS (SELECT s_suppkey AS k, s_name AS n FROM supplier)
            SELECT a.k AS a_k, b.k AS b_k,
                   CAST(levenshtein(a.n, b.n) AS INTEGER) AS dist
            FROM s a JOIN s b ON a.k < b.k
            WHERE levenshtein(a.n, b.n) <= 1
            ORDER BY a_k, b_k"""))

  /** Q115 — BM25 retrieval ([[graft.ops.Bm25]]): top-10 documents for a
    * fixed query, the relevance primitive behind query-based corpus
    * filtering. The oracle recomputes the published formula end-to-end
    * in SQL (ln-idf, tf saturation, length normalization), so any drift
    * in the statistics passes (df, dl, avgdl, N) or the scoring algebra
    * hash-fails. */
  val q115 = QueryDef(
    "q115_bm25_topk",
    (s, d) =>
      graft.ops.Bm25.topDocs(
        Tables.documents(s, d), "text", "doc_id",
        terms = Seq("join", "hash", "filter"), topK = 10),
    Some("""WITH t AS (SELECT doc_id, UNNEST(str_split(text, ' ')) AS term FROM documents),
                 dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
                 st AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM dl),
                 p AS (SELECT term, doc_id, COUNT(*) AS tf FROM t
                       WHERE term IN ('join', 'hash', 'filter') GROUP BY term, doc_id),
                 d AS (SELECT term, COUNT(*) AS df FROM p GROUP BY term),
                 sc AS (SELECT p.doc_id,
                               SUM(LN(1 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
                                   * p.tf * (1.2 + 1.0)
                                   / (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS s
                        FROM p JOIN d USING (term) JOIN dl USING (doc_id) CROSS JOIN st
                        GROUP BY p.doc_id)
            SELECT doc_id, ROUND(s, 6) AS score FROM sc
            ORDER BY score DESC, doc_id LIMIT 10"""))

  /** Q119 — DSv2 aggregate pushdown: corpus accounting (`files / bytes /
    * id range / mean size per format`) answered ENTIRELY from the media
    * source's directory listing — `SupportsPushDownAggregates` complete
    * pushdown means Spark plans no aggregate at all and ZERO files are
    * opened (MediaSourceSpec asserts both). The oracle restates the
    * container ground truth from the documents text bytes: even doc_ids
    * wrap as PNG (57 + n bytes), odd as BMP (54 + n). */
  val q119 = QueryDef(
    "q119_media_agg_pushdown",
    (s, d) => {
      val dir = graft.sources.MediaFixture.ensure(s, d)
      s.read.format("graft-media").load(dir)
        .groupBy("format")
        .agg(
          count(lit(1)).as("n_files"),
          sum("n_bytes").as("total_bytes"),
          min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"),
          round(avg("n_bytes"), 6).as("avg_bytes"))
        .orderBy("format")
    },
    Some("""WITH m AS (SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
                   CASE WHEN doc_id % 2 = 0 THEN 57 ELSE 54 END
                     + octet_length(encode(text)) AS n_bytes
            FROM documents)
            SELECT format,
                   CAST(COUNT(*) AS BIGINT) AS n_files,
                   CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
                   CAST(MIN(doc_id) AS BIGINT) AS min_doc,
                   CAST(MAX(doc_id) AS BIGINT) AS max_doc,
                   ROUND(SUM(n_bytes) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_bytes
            FROM m GROUP BY format ORDER BY format"""))

  /** Q122 — Unicode canonicalization for dedup
    * ([[TextFunctions.canonicalText]], the fused [[graft.functions
    * .CanonicalTextExpr]]): NFC → casefold → whitespace-to-space → keep
    * letters/numbers/space → collapse runs → trim, then exact dedup over
    * the canonical form. The md5 column pins the canonical BYTES
    * cross-engine (DuckDB recomputes the identical chain with
    * `nfc_normalize` + RE2 `\pL`/`\pN` classes), so a divergent casefold,
    * stripped combining mark, or missed whitespace class hash-fails —
    * not just the grouping. */
  val q122 = QueryDef(
    "q122_canonical_dedup",
    (s, d) => {
      val canon = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.canonicalText(col("text")).as("ct"))
      canon.groupBy("ct")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_variants"))
        .select(col("keep_id"), col("n_variants"), md5(col("ct").cast("binary")).as("canon_md5"))
        .orderBy("keep_id")
    },
    Some("""WITH c AS (SELECT doc_id,
                   trim(regexp_replace(regexp_replace(regexp_replace(
                        lower(nfc_normalize(text)),
                        '\s', ' ', 'g'),
                        '[^\pL\pN ]', '', 'g'),
                        '  +', ' ', 'g')) AS ct
            FROM documents)
            SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_variants, md5(ct) AS canon_md5
            FROM c GROUP BY ct ORDER BY keep_id"""),
    headline = true)

  /** Q123 — unigram LM scoring ([[graft.ops.LangModel]]): every document
    * scored by its mean token log-probability under the add-one-smoothed
    * unigram model of the corpus itself — the deterministic member of the
    * model-based quality-filter family (score against a trusted corpus,
    * drop the tail). One vocabulary-keyed shuffle to train, a
    * vocabulary-sized hash join + per-doc agg to score. The oracle
    * recomputes the identical model and smoothing in SQL (LN both sides;
    * per-doc sums are ~1e2 terms, so ROUND(6) is far above FP
    * re-association noise). */
  val q123 = QueryDef(
    "q123_unigram_logprob",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val vocab = graft.ops.LangModel.unigramCounts(docs)
      graft.ops.LangModel.scoreDocs(docs, vocab)
        .select(col("doc_id"), col("n_tokens"), r6(col("avg_logprob")).as("avg_logprob"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, unnest(str_split(text,' ')) AS token FROM documents),
                 v AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY token),
                 s AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total,
                              CAST(COUNT(*) AS DOUBLE) AS v_size FROM v),
                 dt AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY doc_id, token),
                 sc AS (SELECT doc_id, SUM(tf) AS n_tokens,
                               SUM(tf * LN((COALESCE(v.cnt, 0) + 1) / (s.n_total + s.v_size)))
                                 / SUM(tf) AS lp
                        FROM dt LEFT JOIN v USING (token) CROSS JOIN s
                        GROUP BY doc_id)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   ROUND(lp, 6) AS avg_logprob
            FROM sc ORDER BY doc_id"""))

  /** Q125 — token-entropy quality signal (X4, the diversity measure the
    * published heuristic filters pair with repetition): per document,
    * the Shannon entropy of its token distribution,
    * −Σ (tf/n)·ln(tf/n) — 0 for a one-token loop, ln(n) for all-distinct
    * text; low entropy at high length is the template/spam signature.
    * One keyed shuffle: explode → groupBy(doc, token) partial-aggregates
    * map-side (one row per DISTINCT doc-token crosses the wire), then a
    * per-doc fold using the identity H = ln n − (Σ tf·ln tf)/n — a single
    * aggregation, no second pass for the normalizer. The oracle
    * recomputes the direct −Σ p·ln p sum (mathematically identical;
    * both double, ≤ ~1e2 terms — ROUND(6) far above FP noise). */
  val q125 = QueryDef(
    "q125_token_entropy",
    (s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("w"))
        .groupBy("doc_id", "w")
        .agg(count(lit(1)).as("tf"))
      tf.groupBy("doc_id")
        .agg(
          sum(col("tf")).as("n_tokens"),
          sum(col("tf") * log(col("tf"))).as("_tlogt"))
        .select(
          col("doc_id"), col("n_tokens"),
          r6(log(col("n_tokens")) - col("_tlogt") / col("n_tokens")).as("entropy"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, unnest(str_split(text,' ')) AS w FROM documents),
                 tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t GROUP BY doc_id, w),
                 n AS (SELECT doc_id, SUM(tf) AS n FROM tf GROUP BY doc_id)
            SELECT tf.doc_id, CAST(n.n AS BIGINT) AS n_tokens,
                   ROUND(-SUM((tf.tf / CAST(n.n AS DOUBLE))
                              * LN(tf.tf / CAST(n.n AS DOUBLE))), 6) + 0 AS entropy
            FROM tf JOIN n ON tf.doc_id = n.doc_id
            GROUP BY tf.doc_id, n.n ORDER BY tf.doc_id"""))

  /** Q126 — per-source contribution cap (the "domain cap" of published
    * corpus curation: no source may dominate the mix): keep the top-5
    * docs per language by (quality desc, doc_id), through the custom
    * [[graft.plans.TopKPerGroup]] physical operator — bounded partial
    * heaps, k-rows-per-group exchange, never a full per-group sort
    * (q91 pins the operator on the relational side; this is its
    * training-curation framing). */
  val q126 = QueryDef(
    "q126_source_cap",
    (s, d) => {
      val scored = Tables.documents(s, d)
        .select(
          col("doc_id"), col("lang"),
          r6(TextFunctions.qualityScore(col("text"))).as("score"))
      graft.ops.TopK.perGroup(
          scored, Seq(col("lang")), Seq(col("score").desc, col("doc_id")), k = 5)
        .select("lang", "doc_id", "score")
        .orderBy("lang", "doc_id")
    },
    Some("""WITH sc AS (SELECT doc_id, lang,
                   ROUND(CAST(len(list_distinct(str_split(text,' '))) AS DOUBLE)
                         / len(str_split(text,' '))
                         * LEAST(1.0, len(str_split(text,' ')) / 200.0), 6) AS score
            FROM documents)
            SELECT lang, doc_id, score
            FROM (SELECT lang, doc_id, score,
                         ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY score DESC, doc_id) AS rn
                  FROM sc)
            WHERE rn <= 5 ORDER BY lang, doc_id"""))

  /** Q128 — containment near-dup detection (X2's second axis, Broder's
    * asymmetric measure): |probe ∩ candidate| / |probe| — a short doc
    * quoted whole inside a longer one scores ~1 here while its Jaccard
    * stays near zero, so superset-dedup pipelines threshold containment
    * beside it. Same O(n) shape as q29: a FIXED-size broadcast probe set
    * against one corpus scan, top-5 per probe. */
  val q128 = QueryDef(
    "q128_containment",
    (s, d) => {
      val shingled = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), TextFunctions.shingles(col("toks"), 3).as("sh"))
      val probes = shingled
        .orderBy("doc_id").limit(20)
        .select(col("doc_id").as("a_id"), col("sh").as("sha"))
      val scored = shingled
        .join(broadcast(probes), col("doc_id") =!= col("a_id"))
        .select(
          col("a_id"),
          col("doc_id").as("b_id"),
          r6(TextFunctions.containment(col("sha"), col("sh"))).as("cont"))
      scored
        .withColumn(
          "rn",
          row_number().over(
            Window.partitionBy("a_id").orderBy(col("cont").desc, col("b_id"))))
        .filter(col("rn") <= 5)
        .select("a_id", "b_id", "cont")
        .orderBy("a_id", "b_id")
    },
    Some("""WITH dd AS (SELECT doc_id, str_split(text,' ') AS toks FROM documents),
                 sh AS (SELECT doc_id,
                               list_distinct([array_to_string(toks[i:i+2], ' ')
                                              FOR i IN range(1, len(toks)-1)]) AS sh
                        FROM dd WHERE len(toks) >= 3),
                 p AS (SELECT doc_id AS a_id, sh AS sha FROM sh ORDER BY doc_id LIMIT 20),
                 j AS (SELECT a_id, sh.doc_id AS b_id,
                              ROUND(CAST(len(list_intersect(sha, sh.sh)) AS DOUBLE)
                                    / len(sha), 6) AS cont
                       FROM p JOIN sh ON sh.doc_id <> a_id),
                 r AS (SELECT a_id, b_id, cont,
                              ROW_NUMBER() OVER (PARTITION BY a_id
                                                 ORDER BY cont DESC, b_id) AS rn
                       FROM j)
            SELECT a_id, b_id, cont FROM r WHERE rn <= 5 ORDER BY a_id, b_id"""))

  /** Q137 — span-level exact-substring dedup
    * ([[graft.ops.Dedup.repeatedSpans]], the Lee et al. ACL'22 problem):
    * maximal per-doc token spans covered by word 5-grams occurring ≥2
    * times in the corpus, with one global keeper occurrence per gram
    * elected by least (doc_id, pos). The oracle mirrors the whole
    * algorithm relationally in DuckDB (grams → keeper election → flagged
    * occurrences → per-doc interval merge), so a drifted tokenizer,
    * keeper tie-break, or interval-merge boundary hash-fails. Runs the
    * exact-gram form; RepeatedSpanSpec pins hash==exact plus constructed
    * corpora with hand-computed spans. */
  val q137 = QueryDef(
    "q137_repeated_spans",
    (s, d) =>
      Dedup.repeatedSpans(Tables.documents(s, d), "text", "doc_id", 5, hashGrams = false)
        .select(col("doc_id"), col("span_start").cast("long").as("span_start"),
          col("span_end").cast("long").as("span_end"))
        .orderBy("doc_id", "span_start"),
    Some("""WITH dd AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
                 g0 AS (SELECT doc_id,
                               [{'pos': i - 1,
                                 'gram': array_to_string(toks[i:i+4], ' ')}
                                FOR i IN range(1, len(toks) - 3)] AS gs
                        FROM dd WHERE len(toks) >= 5),
                 g1 AS (SELECT doc_id, unnest(gs) AS u FROM g0),
                 g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g1),
                 st AS (SELECT gram, MIN(doc_id * 1000000 + pos) AS keeper
                        FROM g GROUP BY gram HAVING COUNT(*) >= 2),
                 f AS (SELECT DISTINCT doc_id, pos
                       FROM g JOIN st USING (gram)
                       WHERE doc_id * 1000000 + pos <> keeper),
                 m AS (SELECT doc_id, pos,
                              CASE WHEN pos > COALESCE(MAX(pos + 5) OVER
                                     (PARTITION BY doc_id ORDER BY pos
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                                   THEN 1 ELSE 0 END AS ns
                       FROM f),
                 sp AS (SELECT doc_id, pos,
                               SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
                        FROM m)
            SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 5 AS span_end
            FROM sp GROUP BY doc_id, sid
            ORDER BY doc_id, span_start"""))

  /** Q138 — the SCALE path of span dedup: same computation as q137 but
    * shuffling 8-byte xxhash64 gram keys instead of gram strings (the
    * form you run at 100 TB; collisions can only over-flag at ~2^-64).
    * Engine-only by the q27 convention — RepeatedSpanSpec pins
    * hash == exact on this very corpus, and q137 pins exact against the
    * DuckDB oracle, so the pair closes the loop. Headline: measures the
    * tokens → grams → two keyed shuffles → windowed merge pipeline. */
  val q138 = QueryDef(
    "q138_repeated_spans_hashed",
    (s, d) =>
      Dedup.repeatedSpans(Tables.documents(s, d), "text", "doc_id", 5, hashGrams = true)
        .orderBy("doc_id", "span_start"),
    None,
    headline = true)

  /** Q144 — span REMOVAL ([[graft.ops.Dedup.stripRepeatedSpans]]): the
    * rewrite half of span dedup — every doc with its repeated spans cut
    * out (keeper occurrences survive corpus-wide) plus the removed-span
    * count. The oracle extends q137's relational mirror with the strip:
    * explode (pos, token), anti-join the span intervals, reassemble with
    * an ordered string_agg — so a off-by-one span boundary or a lost
    * passthrough doc hash-fails. */
  val q144 = QueryDef(
    "q144_strip_spans",
    (s, d) =>
      Dedup.stripRepeatedSpans(Tables.documents(s, d), "text", "doc_id", 5, hashGrams = false)
        .select(col("doc_id"),
          col("spans_removed").cast("long").as("spans_removed"), col("cleaned"))
        .orderBy("doc_id"),
    Some("""WITH dd AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
                 g0 AS (SELECT doc_id,
                               [{'pos': i - 1,
                                 'gram': array_to_string(toks[i:i+4], ' ')}
                                FOR i IN range(1, len(toks) - 3)] AS gs
                        FROM dd WHERE len(toks) >= 5),
                 g1 AS (SELECT doc_id, unnest(gs) AS u FROM g0),
                 g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g1),
                 st AS (SELECT gram, MIN(doc_id * 1000000 + pos) AS keeper
                        FROM g GROUP BY gram HAVING COUNT(*) >= 2),
                 f AS (SELECT DISTINCT doc_id, pos
                       FROM g JOIN st USING (gram)
                       WHERE doc_id * 1000000 + pos <> keeper),
                 m AS (SELECT doc_id, pos,
                              CASE WHEN pos > COALESCE(MAX(pos + 5) OVER
                                     (PARTITION BY doc_id ORDER BY pos
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                                   THEN 1 ELSE 0 END AS ns
                       FROM f),
                 sp AS (SELECT doc_id, pos,
                               SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
                        FROM m),
                 spans AS (SELECT doc_id, sid, MIN(pos) AS s, MAX(pos) + 5 AS e
                           FROM sp GROUP BY doc_id, sid),
                 tp AS (SELECT doc_id, unnest(range(len(toks))) AS pos,
                               unnest(toks) AS tok
                        FROM dd),
                 kept AS (SELECT tp.doc_id, tp.pos, tp.tok
                          FROM tp LEFT JOIN spans s
                            ON tp.doc_id = s.doc_id AND tp.pos >= s.s AND tp.pos < s.e
                          WHERE s.doc_id IS NULL),
                 nsp AS (SELECT doc_id, COUNT(*) AS spans_removed FROM spans GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(nsp.spans_removed, 0) AS spans_removed,
                   COALESCE(k.cleaned, '') AS cleaned
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned
                       FROM kept GROUP BY doc_id) k USING (doc_id)
            LEFT JOIN nsp USING (doc_id)
            ORDER BY doc_id"""))

  /** Q148 — bigram LM with Stupid Backoff ([[graft.ops.LangModel
    * .scoreDocsBackoff]]): every document's mean log-score under a
    * min-count-pruned bigram model of the corpus, pruned/unseen bigrams
    * backing off to alpha × the add-one unigram — the Brants-style
    * web-scale LM quality signal one rung above q123's unigram. One
    * bigram-keyed shuffle trains; scoring is a pruned-model join + two
    * vocab joins + a per-doc agg. The oracle rebuilds the identical
    * model, pruning, and backoff arithmetic in SQL (LN both sides,
    * ROUND(6) over ~1e2-term per-doc sums). minCount=2 makes the backoff
    * leg load-bearing: every singleton bigram scores through it. */
  val q148 = QueryDef(
    "q148_bigram_backoff",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val uni = graft.ops.LangModel.unigramCounts(docs)
      val bi = graft.ops.LangModel.bigramCounts(docs, minCount = 2L)
      graft.ops.LangModel.scoreDocsBackoff(docs, uni, bi, alpha = 0.4)
        .select(col("doc_id"), col("n_bigrams"), r6(col("avg_logscore")).as("avg_logscore"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
                 b0 AS (SELECT doc_id,
                               [{'w1': toks[i], 'w2': toks[i + 1]}
                                FOR i IN range(1, len(toks))] AS bs
                        FROM t WHERE len(toks) >= 2),
                 b1 AS (SELECT doc_id, unnest(bs) AS u FROM b0),
                 b AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM b1),
                 tok AS (SELECT unnest(str_split(text, ' ')) AS token FROM documents),
                 v AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
                 s AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total,
                              CAST(COUNT(*) AS DOUBLE) AS v_size FROM v),
                 bc AS (SELECT w1, w2, COUNT(*) AS cb FROM b
                        GROUP BY w1, w2 HAVING COUNT(*) >= 2),
                 dt AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM b
                        GROUP BY doc_id, w1, w2),
                 j AS (SELECT dt.doc_id, dt.tf,
                              CASE WHEN bc.cb IS NOT NULL AND v1.cnt IS NOT NULL
                                   THEN LN(CAST(bc.cb AS DOUBLE) / v1.cnt)
                                   ELSE LN(0.4 * (COALESCE(v2.cnt, 0) + 1)
                                           / (s.n_total + s.v_size)) END AS lp
                       FROM dt
                       LEFT JOIN bc USING (w1, w2)
                       LEFT JOIN v v1 ON v1.token = dt.w1
                       LEFT JOIN v v2 ON v2.token = dt.w2
                       CROSS JOIN s),
                 sc AS (SELECT doc_id, SUM(tf) AS n_bigrams,
                               SUM(tf * lp) / SUM(tf) AS lp
                        FROM j GROUP BY doc_id)
            SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
                   ROUND(lp, 6) AS avg_logscore
            FROM sc ORDER BY doc_id"""))

  /** Q154 — cross-source content-overlap matrix
    * ([[graft.ops.SourceOverlap]]): |shared distinct 4-word shingles| per
    * unordered source pair — the pre-mixing audit of source redundancy.
    * The engine shuffles 8-byte shingle hashes and caps per-shingle
    * source-set expansion (quadratic-blowup guard, mirrored in the
    * oracle's HAVING); the oracle joins the shingle STRINGS — identical
    * counts barring a 64-bit collision. */
  val q154 = QueryDef(
    "q154_source_overlap",
    (s, d) =>
      graft.ops.SourceOverlap.shingleOverlap(
        Tables.documents(s, d), "text", "source", shingleLen = 4, maxSources = 1000)
        .orderBy("src_a", "src_b"),
    Some("""WITH t AS (SELECT source, str_split(text, ' ') AS tk FROM documents),
                 i AS (SELECT source, unnest(range(len(tk) - 3)) AS i, tk
                       FROM t WHERE len(tk) >= 4),
                 s AS (SELECT DISTINCT source, array_to_string(tk[i+1:i+4], ' ') AS sh FROM i),
                 f AS (SELECT sh FROM s GROUP BY sh HAVING COUNT(*) BETWEEN 2 AND 1000)
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(COUNT(*) AS BIGINT) AS shared_shingles
            FROM s a JOIN s b ON a.sh = b.sh AND a.source < b.source
            JOIN f ON f.sh = a.sh
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Q161 — declarative data-quality audit ([[graft.ops.Expectations]],
    * Deequ-style): five expectations over `documents` — uniqueness,
    * completeness, range conformance, language coverage, source
    * cardinality — ALL computed in one aggregation job (single scan, any
    * number of checks) and unpivoted to a verdict table. The oracle
    * recomputes every measure independently and must agree on values AND
    * pass flags. */
  val q161 = QueryDef(
    "q161_expectations_audit",
    (s, d) => {
      import graft.ops.Expectations, Expectations.{Expectation, ratio}
      Expectations.audit(Tables.documents(s, d), Seq(
        Expectation("doc_id_unique",
          count_distinct(col("doc_id")).cast("double") / count(lit(1)), 1.0, 1.0),
        Expectation("text_nonnull", ratio(col("text").isNotNull), 1.0, 1.0),
        Expectation("n_chars_in_range", ratio(col("n_chars").between(1, 20000)), 0.99, 1.0),
        Expectation("lang_coverage", ratio(col("lang").isNotNull), 0.5, 1.0),
        Expectation("source_cardinality", count_distinct(col("source")).cast("double"), 1.0, 100.0)
      )).orderBy("check_name")
    },
    Some("""WITH m AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE)/COUNT(*) AS u,
                              AVG(CASE WHEN text IS NOT NULL THEN 1.0 ELSE 0.0 END) AS nn,
                              AVG(CASE WHEN n_chars BETWEEN 1 AND 20000 THEN 1.0 ELSE 0.0 END) AS rng,
                              AVG(CASE WHEN lang IS NOT NULL THEN 1.0 ELSE 0.0 END) AS lc,
                              CAST(COUNT(DISTINCT source) AS DOUBLE) AS sc
                       FROM documents)
            SELECT * FROM (
              SELECT 'doc_id_unique' AS check_name, ROUND(u, 6) AS value,
                     CAST(1.0 AS DOUBLE) AS lo, CAST(1.0 AS DOUBLE) AS hi,
                     ROUND(u, 6) BETWEEN 1.0 AND 1.0 AS pass FROM m
              UNION ALL SELECT 'lang_coverage', ROUND(lc, 6), 0.5, 1.0,
                     ROUND(lc, 6) BETWEEN 0.5 AND 1.0 FROM m
              UNION ALL SELECT 'n_chars_in_range', ROUND(rng, 6), 0.99, 1.0,
                     ROUND(rng, 6) BETWEEN 0.99 AND 1.0 FROM m
              UNION ALL SELECT 'source_cardinality', ROUND(sc, 6), 1.0, 100.0,
                     ROUND(sc, 6) BETWEEN 1.0 AND 100.0 FROM m
              UNION ALL SELECT 'text_nonnull', ROUND(nn, 6), 1.0, 1.0,
                     ROUND(nn, 6) BETWEEN 1.0 AND 1.0 FROM m)
            ORDER BY check_name"""))

  /** Q173 — windowed co-occurrence PMI ([[graft.ops.Cooccurrence]],
    * Church & Hanks collocation scoring): unordered token pairs within
    * a 3-token window, pair count ≥ 5, top-50 by PMI. Pair volume is
    * position-banded (window·T, never T²); the score is computed from
    * exact integer products cast to double only at the final division,
    * so both engines produce the identical bits and ROUND(·, 4) cannot
    * straddle. The oracle replays tokenize→band-join→count→ln in
    * DuckDB. */
  val q173 = QueryDef(
    "q173_cooccurrence_pmi",
    (s, d) =>
      graft.ops.Cooccurrence
        .pmi(Tables.documents(s, d), "doc_id", "text", window = 3, minPairCount = 5L)
        .select(col("w1"), col("w2"), col("c_pair"), r4(col("pmi")).as("pmi"))
        .orderBy(desc("pmi"), col("w1"), col("w2"))
        .limit(50),
    Some("""WITH raw AS (
              SELECT doc_id,
                     unnest(str_split(text, ' ')) AS tok,
                     unnest(range(1, len(str_split(text, ' ')) + 1)) AS i
              FROM documents),
            tk AS (SELECT doc_id, tok, i FROM raw WHERE tok <> ''),
            pairs AS (
              SELECT LEAST(a.tok, b.tok) AS w1, GREATEST(a.tok, b.tok) AS w2
              FROM tk a JOIN tk b
                ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 3),
            pc AS (SELECT w1, w2, COUNT(*) AS c_pair
                   FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 5),
            uni AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY 1),
            tot AS (SELECT (SELECT COUNT(*) FROM tk) AS t,
                           (SELECT COUNT(*) FROM pairs) AS p)
            SELECT w1, w2, c_pair,
                   ROUND(LN(CAST(c_pair * t * t AS DOUBLE) /
                            CAST(p * u1.c * u2.c AS DOUBLE)), 4) AS pmi
            FROM pc, tot
            JOIN uni u1 ON u1.tok = w1
            JOIN uni u2 ON u2.tok = w2
            ORDER BY pmi DESC, w1, w2 LIMIT 50"""))

  /** Q175 — chi-square independence audit ([[graft.ops.Contingency]]):
    * language × source cell counts against the independence expectation
    * E = rowTotal·colTotal/N with per-cell (O−E)²/E contributions — the
    * screen for "is this shard's language mix skewed". One keyed cell
    * aggregation + margin joins; expected/chi² quantize via
    * floor(x·10⁴+0.5) (rationals of integer margins can land exactly on
    * round-half boundaries where the engines' round algorithms split). */
  val q175 = QueryDef(
    "q175_chi2_independence",
    (s, d) =>
      graft.ops.Contingency
        .chi2(Tables.documents(s, d), "lang", "source")
        .select(
          col("a").as("lang"), col("b").as("source"), col("observed"),
          floor(col("expected") * 10000 + lit(0.5)).cast("long").as("expected_e4"),
          floor(col("chi2_term") * 10000 + lit(0.5)).cast("long").as("chi2_e4"))
        .orderBy("lang", "source"),
    Some("""WITH cells AS (SELECT lang AS a, source AS b, COUNT(*) AS observed
                           FROM documents
                           WHERE lang IS NOT NULL AND source IS NOT NULL
                           GROUP BY 1, 2),
                 rt AS (SELECT a, SUM(observed) AS at FROM cells GROUP BY 1),
                 ct AS (SELECT b, SUM(observed) AS bt FROM cells GROUP BY 1),
                 nn AS (SELECT SUM(observed) AS n FROM cells),
                 e AS (SELECT a, b, observed,
                              CAST(at * bt AS DOUBLE) / CAST(n AS DOUBLE) AS expected
                       FROM cells JOIN rt USING (a) JOIN ct USING (b), nn)
            SELECT a AS lang, b AS source, observed,
                   CAST(FLOOR(expected * 10000 + 0.5) AS BIGINT) AS expected_e4,
                   CAST(FLOOR((observed - expected) * (observed - expected) / expected
                              * 10000 + 0.5) AS BIGINT) AS chi2_e4
            FROM e ORDER BY lang, source"""))

  /** Q181 — duplicate-cluster representative selection: q88's duplicate
    * GROUPS (rare-trigram edges → connected components) reduced to one
    * canonical document per cluster — keep the longest text, break ties
    * on the smallest doc_id. This is the "keep-best" half of
    * deduplication (q26/q88 find the duplicates; this picks the survivor
    * by QUALITY instead of arbitrary keep-first). The argmax is a
    * `max(struct(quality, -id))` over the label table — three scalar
    * aggregates per cluster, no window over data-sized input; the oracle
    * re-derives clusters with the recursive CTE and picks via
    * ROW_NUMBER. */
  val q181 = QueryDef(
    "q181_cluster_representative",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .filter(TextFunctions.tokenCount(col("text")) >= 3)
      val sh = docs.select(
        col("doc_id"),
        explode(graft.functions.ShingleHashSetExpr(
          TextFunctions.tokens(col("text")), 3)).as("h"))
      val edges = sh.groupBy("h").agg(
        count(lit(1)).as("df"),
        min(col("doc_id")).as("src"),
        max(col("doc_id")).as("dst"))
        .filter(col("df") === 2)
        .select("src", "dst")
        .distinct()
      val (labels, _) = ConnectedComponents.label(edges)
      labels.select(col("id").as("doc_id"), col("comp"))
        .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
        .groupBy("comp")
        .agg(
          count(lit(1)).as("n_members"),
          max(struct(col("n_chars").as("c"), (-col("doc_id")).as("nd"))).as("m"))
        .select(
          col("comp"), (-col("m.nd")).as("rep_doc_id"),
          col("m.c").as("rep_n_chars"), col("n_members"))
        .orderBy("comp")
    },
    Some("""WITH RECURSIVE
           |  tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents
           |          WHERE len(str_split(text, ' ')) >= 3),
           |  sh AS (SELECT DISTINCT doc_id, s FROM (
           |           SELECT doc_id,
           |                  UNNEST(list_transform(range(1, len(t) - 1),
           |                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
           |           FROM tok)),
           |  rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) = 2),
           |  edges AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
           |            FROM sh a JOIN rare USING (s) JOIN sh b USING (s)
           |            WHERE a.doc_id < b.doc_id),
           |  sym AS (SELECT src, dst FROM edges
           |          UNION SELECT dst AS src, src AS dst FROM edges),
           |  reach(a, b) AS (SELECT src, dst FROM sym
           |                  UNION
           |                  SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
           |  comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a),
           |  memb AS (SELECT c.doc_id, c.comp, d.n_chars
           |           FROM comp c JOIN documents d USING (doc_id)),
           |  ranked AS (SELECT *, ROW_NUMBER() OVER
           |               (PARTITION BY comp ORDER BY n_chars DESC, doc_id) AS rk
           |             FROM memb),
           |  sizes AS (SELECT comp, COUNT(*) AS n_members FROM memb GROUP BY 1)
           |SELECT r.comp, r.doc_id AS rep_doc_id, r.n_chars AS rep_n_chars,
           |       s.n_members
           |FROM ranked r JOIN sizes s USING (comp)
           |WHERE r.rk = 1 ORDER BY r.comp""".stripMargin))

  /** Q182 — Welch two-sample t-test ([[graft.ops.Contingency.welchT]]):
    * does src0 differ from src1 in document length? One conditional
    * aggregation pass (six scalars, no join); the oracle restates the
    * t statistic and Welch–Satterthwaite dof from SQL aggregates. */
  val q182 = QueryDef(
    "q182_welch_ttest",
    (s, d) =>
      graft.ops.Contingency.welchT(
        Tables.documents(s, d), "source", "n_chars", "src0", "src1")
        .select(
          col("n1"), col("n2"), r6(col("mean1")).as("mean1"),
          r6(col("mean2")).as("mean2"), r4(col("t_stat")).as("t_stat"),
          r4(col("dof")).as("dof")),
    Some("""WITH a AS (SELECT COUNT(*) AS n1, AVG(n_chars) AS m1,
           |                  VAR_SAMP(n_chars) AS v1
           |           FROM documents WHERE source = 'src0'),
           |     b AS (SELECT COUNT(*) AS n2, AVG(n_chars) AS m2,
           |                  VAR_SAMP(n_chars) AS v2
           |           FROM documents WHERE source = 'src1')
           |SELECT n1, n2, ROUND(m1, 6) AS mean1, ROUND(m2, 6) AS mean2,
           |       ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 4) AS t_stat,
           |       ROUND(POWER(v1 / n1 + v2 / n2, 2)
           |             / (POWER(v1 / n1, 2) / (n1 - 1)
           |                + POWER(v2 / n2, 2) / (n2 - 1)), 4) AS dof
           |FROM a, b""".stripMargin))

  /** Q183 — overlapping token-window chunking ([[graft.ops.Chunking]]):
    * every document split into 64-token chunks at stride 48 (16-token
    * overlap) — the context-window preprocessing step for training
    * samples / retrieval units. Pure codegen collection expressions, no
    * shuffle; the oracle re-derives the same windows with
    * generate_series + list slicing. */
  val q183 = QueryDef(
    "q183_token_chunks",
    (s, d) =>
      graft.ops.Chunking.slidingTokenChunks(
        Tables.documents(s, d), Seq("doc_id"), "text", 64, 48)
        .select(col("doc_id"), col("chunk_id"), col("n_tok"),
          substring(col("chunk"), 1, 40).as("chunk_head"))
        .orderBy("doc_id", "chunk_id"),
    Some("""WITH tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
           |     st AS (SELECT doc_id, t,
           |                   UNNEST(generate_series(0, len(t) - 1, 48)) AS s
           |            FROM tok WHERE len(t) >= 1)
           |SELECT doc_id, CAST(s / 48 AS INTEGER) AS chunk_id,
           |       CAST(len(t[s + 1 : s + 64]) AS INTEGER) AS n_tok,
           |       SUBSTRING(array_to_string(t[s + 1 : s + 64], ' '), 1, 40)
           |         AS chunk_head
           |FROM st ORDER BY doc_id, chunk_id""".stripMargin),
    headline = true)

  /** Q190 — perceptual image hashing ([[Multimodal.averageHashBits]],
    * X5 + X2 combined): every document's raster reduced to its 64-bit
    * average-hash — the standard image near-dup fingerprint (hamming ≤ t
    * on these = near-identical images; band-substring blocking reuses the
    * q28 pigeonhole shape). The pipeline is REAL bytes end to end
    * (raster → nearest-neighbor 8×8 → gray mean → bits); the oracle
    * recomputes the same bits from the closed-form pixel function, so a
    * wrong resize index, gray formula, or threshold edge flips hash bits
    * and fails. Duplicate groups fall out as equal hashes (identical-dim
    * rasters collide by construction — the fixture's honest ground
    * truth, asserted via the group count). */
  val q190 = QueryDef(
    "q190_image_ahash",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), octet_length(col("text").cast("binary")).as("n"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, n) =>
          val w = 1 + n % 16
          val h = 1 + n % 8
          val bits = Multimodal.averageHashBits(Multimodal.toBmpRaster(w, h))
            .getOrElse(sys.error(s"raster for doc $id failed to hash"))
          (id, w, h, bits)
        })
        .toDF("doc_id", "width", "height", "ahash")
        .orderBy("doc_id")
    },
    Some("""WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
           |     d AS (SELECT doc_id, 1 + n % 16 AS w, 1 + n % 8 AS h FROM p),
           |     g AS (SELECT doc_id, w, h,
           |                  [ ((i % 8) * w // 8 * 7 + (i // 8) * h // 8 * 13) % 256
           |                  + ((i % 8) * w // 8 * 31 + (i // 8) * h // 8) % 256
           |                  + ((i % 8) * w // 8 + (i // 8) * h // 8 * 57) % 256
           |                    FOR i IN range(0, 64) ] AS gs
           |           FROM d)
           |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           |       array_to_string([ CASE WHEN x * 64 > list_sum(gs) THEN '1' ELSE '0' END
           |                         FOR x IN gs ], '') AS ahash
           |FROM g ORDER BY doc_id""".stripMargin),
    headline = true)

  /** Q191 — near-duplicate images by perceptual hash (q190's hashes +
    * [[graft.functions.HammingDistance]], the engine's fused codegen
    * expression): banded LSH blocking — 4 ×16-bit bands, two hashes
    * within hamming ≤ 6 of each other must agree exactly on ≥1 band
    * (pigeonhole: 7 differing bits can't hit all 4 bands) — so the join
    * is band-keyed equality, NEVER all-pairs; candidates then pay one
    * fused byte-loop distance each. The oracle rebuilds hashes, bands,
    * and per-character distances in SQL — a codegen bug in the distance
    * loop or a band-boundary off-by-one changes pairs and fails. */
  val q191 = QueryDef(
    "q191_image_neardup",
    (s, d) => {
      import s.implicits._
      val hashes = Tables.documents(s, d)
        .select(col("doc_id"), octet_length(col("text").cast("binary")).as("n"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, n) =>
          val bits = Multimodal
            .averageHashBits(Multimodal.toBmpRaster(1 + n % 16, 1 + n % 8))
            .getOrElse(sys.error(s"raster for doc $id failed to hash"))
          (id, bits)
        })
        .toDF("doc_id", "ahash")
      val bands = hashes.select(
        col("doc_id"), col("ahash"),
        posexplode(array((0 until 4).map(i =>
          substring(col("ahash"), i * 16 + 1, 16)): _*)).as(Seq("band_no", "band")))
      val cand = bands.as("x").join(
        bands.as("y"),
        col("x.band_no") === col("y.band_no") && col("x.band") === col("y.band") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(
          col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.ahash").as("ha"), col("y.ahash").as("hb"))
        .distinct()
      cand
        .select(col("doc_a"), col("doc_b"),
          graft.functions.HammingDistance(col("ha"), col("hb")).as("dist"))
        .filter(col("dist") <= 6)
        .orderBy("doc_a", "doc_b")
    },
    Some("""WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
           |     dd AS (SELECT doc_id, 1 + n % 16 AS w, 1 + n % 8 AS h FROM p),
           |     g AS (SELECT doc_id,
           |                  [ ((i % 8) * w // 8 * 7 + (i // 8) * h // 8 * 13) % 256
           |                  + ((i % 8) * w // 8 * 31 + (i // 8) * h // 8) % 256
           |                  + ((i % 8) * w // 8 + (i // 8) * h // 8 * 57) % 256
           |                    FOR i IN range(0, 64) ] AS gs
           |           FROM dd),
           |     hsh AS (SELECT doc_id,
           |                    array_to_string([ CASE WHEN x * 64 > list_sum(gs)
           |                                           THEN '1' ELSE '0' END
           |                                      FOR x IN gs ], '') AS ahash
           |             FROM g),
           |     e AS (SELECT doc_id, ahash, UNNEST([0, 1, 2, 3]) AS band_no FROM hsh),
           |     b AS (SELECT doc_id, ahash, band_no,
           |                  SUBSTRING(ahash, band_no * 16 + 1, 16) AS band
           |           FROM e),
           |     cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           |                     x.ahash AS ha, y.ahash AS hb
           |              FROM b x JOIN b y
           |                ON x.band_no = y.band_no AND x.band = y.band
           |               AND x.doc_id < y.doc_id),
           |     scored AS (SELECT doc_a, doc_b,
           |                       CAST(list_sum([ CASE WHEN ha[i] = hb[i] THEN 0 ELSE 1 END
           |                                       FOR i IN range(1, 65) ]) AS INTEGER) AS dist
           |                FROM cand)
           |SELECT doc_a, doc_b, dist FROM scored
           |WHERE dist <= 6 ORDER BY doc_a, doc_b""".stripMargin))

  /** Q210 — distinctive vocabulary per source: Monroe/Colaresi/Quinn
    * log-odds ratio with an informative Dirichlet prior (the "Fightin'
    * Words" statistic, Political Analysis 2008) — for each source, the
    * 3 words most over-represented vs the rest of the corpus, by the
    * z-scored smoothed log-odds delta. All shuffles are keyed on
    * (source, word) / word / source; the final top-3-per-source runs
    * through the [[graft.plans.TopKPerGroup]] physical operator, and
    * the rank window orders 3 rows per source (bounded). Rare words
    * (corpus count < 5) are excluded before scoring, so the prior mass
    * α₀ = α·|scored vocabulary| is identical in both engines. */
  val q210 = QueryDef(
    "q210_distinctive_terms",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val words = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
      val caw = words.groupBy("source", "word").agg(count(lit(1)).as("c_aw"))
      val cw = words.groupBy("word").agg(count(lit(1)).as("c_w"))
        .filter(col("c_w") >= 5)
      val na = words.groupBy("source").agg(count(lit(1)).as("n_a"))
      val tot = caw.join(cw, "word")
        .agg(sum(col("c_aw")).as("n"), countDistinct(col("word")).as("v"))
      val alpha = 0.5
      val scored = caw.join(cw, "word")
        .join(broadcast(na), "source")
        .crossJoin(broadcast(tot))
        .withColumn("a0", lit(alpha) * col("v"))
        .withColumn("rest", col("c_w") - col("c_aw"))
        .withColumn("delta",
          log((col("c_aw") + lit(alpha)) / (col("n_a") + col("a0") - col("c_aw") - lit(alpha)))
            - log((col("rest") + lit(alpha))
              / (col("n") - col("n_a") + col("a0") - col("rest") - lit(alpha))))
        .withColumn("z",
          col("delta") / sqrt(lit(1.0) / (col("c_aw") + lit(alpha))
            + lit(1.0) / (col("rest") + lit(alpha))))
      graft.ops.TopK.perGroup(
          scored, Seq(col("source")), Seq(col("z").desc, col("word")), k = 3)
        .withColumn("rank",
          row_number().over(Window.partitionBy("source").orderBy(col("z").desc, col("word"))))
        .select(col("source"), col("rank"), col("word"), col("c_aw"), r4(col("z")).as("z"))
        .orderBy("source", "rank")
    },
    Some("""WITH w AS (
           |  SELECT source, unnest(str_split(text, ' ')) AS word FROM documents),
           |ww AS (SELECT source, word FROM w WHERE word <> ''),
           |caw AS (SELECT source, word, COUNT(*) AS c_aw FROM ww GROUP BY 1, 2),
           |cw AS (SELECT word, COUNT(*) AS c_w FROM ww GROUP BY 1 HAVING COUNT(*) >= 5),
           |na AS (SELECT source, COUNT(*) AS n_a FROM ww GROUP BY 1),
           |t AS (SELECT SUM(c_aw) AS n, COUNT(DISTINCT caw.word) AS v
           |      FROM caw JOIN cw USING (word)),
           |sc AS (
           |  SELECT caw.source, caw.word, caw.c_aw,
           |         (LN((caw.c_aw + 0.5) / (na.n_a + 0.5 * t.v - caw.c_aw - 0.5))
           |          - LN((cw.c_w - caw.c_aw + 0.5)
           |               / (t.n - na.n_a + 0.5 * t.v - (cw.c_w - caw.c_aw) - 0.5)))
           |         / SQRT(1.0 / (caw.c_aw + 0.5) + 1.0 / (cw.c_w - caw.c_aw + 0.5)) AS z
           |  FROM caw JOIN cw USING (word) JOIN na USING (source), t),
           |r AS (
           |  SELECT source, word, c_aw, z,
           |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY z DESC, word) AS rank
           |  FROM sc)
           |SELECT source, rank, word, c_aw, ROUND(z, 4) AS z
           |FROM r WHERE rank <= 3 ORDER BY source, rank""".stripMargin))

  /** Q211 — EXACT Jaccard near-dup pairs (≥ 0.6) over 3-word-shingle
    * sets for the whole corpus via [[graft.ops.SetSimJoin]] prefix
    * filtering — the no-false-negative counterpart of the MinHash (q27)
    * and SimHash (q28) approximate paths (shingles capture phrasing:
    * random texts over a shared dictionary score ~0, true near-dups ~1).
    * The oracle recomputes every qualifying pair from the full quadratic
    * shingle join, so any pair the prefix filter loses hash-fails
    * here. */
  val q211 = QueryDef(
    "q211_setsim_join_exact",
    (s, d) =>
      graft.ops.SetSimJoin
        .selfJoin(
          graft.ops.SetSimJoin.wordShingles(Tables.documents(s, d), "doc_id", "text", n = 3),
          threshold = 0.6)
        .select(col("id_a"), col("id_b"), col("inter"), r4(col("jac")).as("jac"))
        .orderBy("id_a", "id_b"),
    Some("""WITH words AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
           |idx AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
           |        FROM words WHERE len(ws) >= 3),
           |sh AS (SELECT DISTINCT doc_id,
           |              ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS w
           |       FROM idx),
           |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
           |      FROM sh a JOIN sh b ON a.w = b.w AND a.doc_id < b.doc_id
           |      GROUP BY 1, 2)
           |SELECT p.id_a, p.id_b, p.inter,
           |       ROUND(p.inter * 1.0 / (sa.n + sb.n - p.inter), 4) AS jac
           |FROM p JOIN sz sa ON sa.doc_id = p.id_a
           |       JOIN sz sb ON sb.doc_id = p.id_b
           |WHERE p.inter * 1.0 / (sa.n + sb.n - p.inter) >= 0.6
           |ORDER BY 1, 2""".stripMargin),
    headline = true)

  /** Q218 — community detection by synchronous label propagation
    * ([[graft.ops.LabelPropagation]], Raghavan 2007): q88's rare-shingle
    * duplicate edges re-clustered by dense neighborhoods instead of bare
    * reachability. Three deterministic synchronous rounds (self-vote +
    * (count desc, label asc) tie-break — a pure function of the edge
    * set), which the oracle mirrors as three unrolled SQL update steps,
    * so a wrong join side, a missed self-vote, or a busted tie-break
    * hash-fails. */
  val q218 = QueryDef(
    "q218_label_communities",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .filter(TextFunctions.tokenCount(col("text")) >= 3)
      val sh = docs.select(
        col("doc_id"),
        explode(graft.functions.ShingleHashSetExpr(
          TextFunctions.tokens(col("text")), 3)).as("h"))
      val edges = sh.groupBy("h").agg(
        count(lit(1)).as("df"),
        min(col("doc_id")).as("src"),
        max(col("doc_id")).as("dst"))
        .filter(col("df") === 2)
        .select("src", "dst")
        .distinct()
      graft.ops.LabelPropagation.run(edges, iters = 3)
        .select(col("id").as("doc_id"), col("label"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents
                         WHERE len(str_split(text, ' ')) >= 3),
                 sh AS (SELECT DISTINCT doc_id, s FROM (
                          SELECT doc_id,
                                 UNNEST(list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
                          FROM tok)),
                 rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) = 2),
                 edges AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
                           FROM sh a JOIN rare USING (s) JOIN sh b USING (s)
                           WHERE a.doc_id < b.doc_id),
                 sym AS (SELECT src, dst FROM edges
                         UNION SELECT dst AS src, src AS dst FROM edges),
                 l0 AS (SELECT DISTINCT src AS id, src AS label FROM sym),
                 v1 AS (SELECT s.src AS vid, p.label FROM sym s JOIN l0 p ON s.dst = p.id
                        UNION ALL SELECT id AS vid, label FROM l0),
                 c1 AS (SELECT vid, label, COUNT(*) AS cnt FROM v1 GROUP BY vid, label),
                 l1 AS (SELECT vid AS id, label FROM (
                          SELECT vid, label,
                                 ROW_NUMBER() OVER (PARTITION BY vid
                                                    ORDER BY cnt DESC, label) AS rk
                          FROM c1) WHERE rk = 1),
                 v2 AS (SELECT s.src AS vid, p.label FROM sym s JOIN l1 p ON s.dst = p.id
                        UNION ALL SELECT id AS vid, label FROM l1),
                 c2 AS (SELECT vid, label, COUNT(*) AS cnt FROM v2 GROUP BY vid, label),
                 l2 AS (SELECT vid AS id, label FROM (
                          SELECT vid, label,
                                 ROW_NUMBER() OVER (PARTITION BY vid
                                                    ORDER BY cnt DESC, label) AS rk
                          FROM c2) WHERE rk = 1),
                 v3 AS (SELECT s.src AS vid, p.label FROM sym s JOIN l2 p ON s.dst = p.id
                        UNION ALL SELECT id AS vid, label FROM l2),
                 c3 AS (SELECT vid, label, COUNT(*) AS cnt FROM v3 GROUP BY vid, label),
                 l3 AS (SELECT vid AS id, label FROM (
                          SELECT vid, label,
                                 ROW_NUMBER() OVER (PARTITION BY vid
                                                    ORDER BY cnt DESC, label) AS rk
                          FROM c3) WHERE rk = 1)
            SELECT id AS doc_id, label FROM l3 ORDER BY doc_id"""))

  /** Q220 — inverted-index build (the search-index core): for the 15 most
    * frequent corpus terms, the per-term posting list — document
    * frequency, total term frequency, and the top-3 documents by tf with
    * rank. Shapes: one (term, doc)-keyed tf aggregate, one term-keyed df
    * rollup, the 15-term head broadcast back, and a term-PARTITIONED
    * row_number — never a global window; posting lists stay distributed
    * by term, which is exactly how a shard-by-term index is laid out at
    * scale. Total tie-breaks ((cnt, term) and (tf, doc_id)) make the head
    * and ranks deterministic, so the oracle hash-matches. */
  val q220 = QueryDef(
    "q220_inverted_index",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // per-doc term frequencies are ROW-LOCAL (r19, the ContentChunking
      // pattern): sort the token array, run-length-encode it with array
      // expressions, explode already-aggregated (term, tf) rows — the
      // (term, doc_id)-keyed exchange the old explode → groupBy paid
      // (every token occurrence through one shuffle) disappears; the
      // multiset of (term, doc_id, tf) rows is identical, so every
      // downstream aggregate/rank is unchanged (oracle-pinned).
      // The trailing repartition(term) is the ONE data-sized exchange,
      // and it is load-bearing twice over: tf feeds two consumers
      // (termStats and the posting-list window), and without an exchange
      // boundary Catalyst re-runs the row-local RLE scan per consumer —
      // the exchange is the reuse point (ReusedExchange). It also leaves
      // tf hash-partitioned by term, so termStats aggregates and the
      // term-keyed window sort WITHOUT further exchanges. Net plan: one
      // exchange of run-length-encoded rows (≈ distinct (term, doc)
      // pairs) where the r18 shape paid the same exchange PLUS a
      // term-keyed partial-agg exchange plus a window exchange.
      val tf = docs
        .withColumn("_s", array_sort(TextFunctions.tokens(col("text"))))
        .withColumn("_starts", expr(
          """filter(sequence(0, size(_s) - 1), i ->
            |  i = 0 OR element_at(_s, i + 1) != element_at(_s, i))""".stripMargin))
        .select(col("doc_id"), explode(expr(
          """transform(_starts, (st, j) -> named_struct(
            |  'term', element_at(_s, st + 1),
            |  'tf', CAST(IF(j + 1 < size(_starts),
            |     element_at(_starts, j + 2), size(_s)) - st AS BIGINT)))"""
            .stripMargin)).as("_c"))
        .select(col("_c.term").as("term"), col("doc_id"), col("_c.tf").as("tf"))
        // vacuously true (split() never yields null elements) but
        // REQUIRED for the exchange reuse: the inner join pushes
        // isnotnull(term) below the exchange on ITS branch only, and a
        // one-filter difference stops the two subtrees from
        // canonicalizing equal — stating it once here puts the same
        // filter under BOTH consumers
        .filter(col("term").isNotNull)
        .repartition(col("term"))
      // count(doc_id) — value-identical to count(*) (doc_id is never
      // null), but it keeps this branch's pruned schema equal to the
      // window branch's (term, doc_id, tf), so BOTH consumers plan the
      // exact same exchange subtree and physical planning reuses it
      // (ReusedExchange). With count(lit(1)) the column pruner narrowed
      // this branch to (term, tf), the subtrees stopped matching, and
      // the row-local RLE scan ran once per consumer.
      val termStats = tf.groupBy("term").agg(
        count(col("doc_id")).as("df"),
        sum(col("tf")).as("total_tf"))
      val head = termStats
        .orderBy(col("total_tf").desc, col("term"))
        .limit(15)
      val w = Window.partitionBy(col("term"))
        .orderBy(col("tf").desc, col("doc_id"))
      tf.join(broadcast(head), Seq("term"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(
          col("term"), col("df"), col("total_tf"),
          col("doc_id"), col("tf"), col("rk"))
        .orderBy(col("term"), col("rk"))
    },
    Some("""WITH tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM (
                          SELECT doc_id, UNNEST(str_split(text, ' ')) AS term
                          FROM documents)
                        GROUP BY term, doc_id),
                 ts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
                               CAST(SUM(tf) AS BIGINT) AS total_tf
                        FROM tf GROUP BY term),
                 head AS (SELECT * FROM ts ORDER BY total_tf DESC, term LIMIT 15),
                 r AS (SELECT h.term, h.df, h.total_tf, tf.doc_id,
                              CAST(tf.tf AS BIGINT) AS tf,
                              ROW_NUMBER() OVER (PARTITION BY h.term
                                                 ORDER BY tf.tf DESC, tf.doc_id) AS rk
                       FROM head h JOIN tf ON h.term = tf.term)
            SELECT term, df, total_tf, doc_id, tf, CAST(rk AS INTEGER) AS rk
            FROM r WHERE rk <= 3 ORDER BY term, rk"""),
    headline = true)

  /** Q225 — leakage-safe train/val/test split: near-duplicate CLUSTERS
    * (q88's rare-shingle edges closed by [[ConnectedComponents]]) are
    * assigned to splits atomically — every doc hashes on its cluster
    * representative, not its own id, so two near-identical documents can
    * never straddle train and test (the classic eval-contamination bug
    * that per-doc hashing bakes in). Singletons (no near-dup edge) keep
    * their own id as cluster, so the split stays q110-stable for the
    * unclustered bulk of the corpus. `n_moved` counts docs whose split
    * CHANGED vs naive per-doc hashing — the leakage the cluster pass
    * prevented. Cost over q110: the edge build + CC rounds, then the same
    * one aggregation; the md5 bucket stays a row-local expression. */
  val q225 = QueryDef(
    "q225_cluster_safe_split",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sh = docs
        .filter(TextFunctions.tokenCount(col("text")) >= 3)
        .select(
          col("doc_id"),
          explode(graft.functions.ShingleHashSetExpr(
            TextFunctions.tokens(col("text")), 3)).as("h"))
      val edges = sh.groupBy("h").agg(
        count(lit(1)).as("df"),
        min(col("doc_id")).as("src"),
        max(col("doc_id")).as("dst"))
        .filter(col("df") === 2)
        .select("src", "dst")
        .distinct()
      val (labels, _) = ConnectedComponents.label(edges)
      def bucket(c: org.apache.spark.sql.Column) = conv(
        substring(md5(concat(lit("split-v1:"), c.cast("string"))), 1, 4),
        16, 10).cast("int") % 100
      def splitOf(c: org.apache.spark.sql.Column) =
        when(bucket(c) < 80, "train").when(bucket(c) < 90, "val").otherwise("test")
      docs
        .join(labels.select(col("id").as("doc_id"), col("comp")), Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("comp"), col("doc_id")))
        .select(
          col("doc_id"), col("cluster"),
          splitOf(col("cluster")).as("split"),
          (splitOf(col("cluster")) =!= splitOf(col("doc_id"))).cast("long").as("moved"))
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("cluster")).as("n_clusters"),
          sum(col("moved")).as("n_moved"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy("split")
    },
    Some("""WITH RECURSIVE
              tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents
                      WHERE len(str_split(text, ' ')) >= 3),
              sh AS (SELECT DISTINCT doc_id, s FROM (
                       SELECT doc_id,
                              UNNEST(list_transform(range(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
                       FROM tok)),
              rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) = 2),
              edges AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
                        FROM sh a JOIN rare USING (s) JOIN sh b USING (s)
                        WHERE a.doc_id < b.doc_id),
              sym AS (SELECT src, dst FROM edges
                      UNION SELECT dst AS src, src AS dst FROM edges),
              reach(a, b) AS (SELECT src, dst FROM sym
                              UNION
                              SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
              comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a),
              cl AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster
                     FROM documents d LEFT JOIN comp c USING (doc_id)),
              sp AS (SELECT doc_id, cluster,
                            CAST(('0x' || substr(md5('split-v1:' || CAST(cluster AS VARCHAR)), 1, 4))
                                 AS INTEGER) % 100 AS bc,
                            CAST(('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 4))
                                 AS INTEGER) % 100 AS bd
                     FROM cl),
              lab AS (SELECT doc_id, cluster,
                             CASE WHEN bc < 80 THEN 'train' WHEN bc < 90 THEN 'val' ELSE 'test' END AS split,
                             CASE WHEN (CASE WHEN bc < 80 THEN 'train' WHEN bc < 90 THEN 'val' ELSE 'test' END)
                                  <> (CASE WHEN bd < 80 THEN 'train' WHEN bd < 90 THEN 'val' ELSE 'test' END)
                                  THEN 1 ELSE 0 END AS moved
                      FROM sp)
            SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_clusters,
                   CAST(SUM(moved) AS BIGINT) AS n_moved,
                   CAST(SUM(doc_id) AS BIGINT) AS id_sum
            FROM lab GROUP BY 1 ORDER BY 1"""),
    headline = true)

  /** Q226 — exact dedup with SOURCE PREFERENCE
    * ([[Dedup.exactBySourcePriority]]): within each content-identical
    * group, keep the copy from the most-preferred source (curated dump
    * beats crawls) instead of the lowest id — one min_by folded into the
    * same single digest-keyed groupBy as q26, so preference costs
    * nothing. The oracle replays the ordering as a window rank over raw
    * text groups, so a wrong tie-break (rank, source, id) hash-fails. */
  val q226 = QueryDef(
    "q226_dedup_source_priority",
    (s, d) =>
      Dedup.exactBySourcePriority(
        Tables.documents(s, d), "text", "doc_id", "source",
        Seq("src13", "src5", "src2"))
        .select("keep_id", "keep_source", "dup_cnt")
        .orderBy("keep_id"),
    Some("""WITH r AS (SELECT doc_id, source, text,
                              CASE source WHEN 'src13' THEN 0 WHEN 'src5' THEN 1
                                          WHEN 'src2' THEN 2 ELSE 3 END AS rk
                       FROM documents),
                 w AS (SELECT doc_id, source,
                              ROW_NUMBER() OVER (PARTITION BY text
                                                 ORDER BY rk, source, doc_id) AS rn,
                              COUNT(*) OVER (PARTITION BY text) AS dup_cnt
                       FROM r)
            SELECT doc_id AS keep_id, source AS keep_source,
                   CAST(dup_cnt AS BIGINT) AS dup_cnt
            FROM w WHERE rn = 1 ORDER BY keep_id"""))

  /** Q233 — exact phrase retrieval from the positional index
    * ([[graft.ops.PhraseIndex]]): two phrase queries answered purely from
    * (term, doc, pos) postings via the anchor-group trick (one shuffle
    * per phrase, broadcast term→offset table; a repeated term like
    * "batch batch" needs no special case and reports overlapping
    * runs). The oracle replays the
    * same anchor arithmetic in SQL over str_split positions, so an
    * off-by-one in pos, a wrong distinct-offset count, or a missed
    * overlapping occurrence hash-fails. */
  val q233 = QueryDef(
    "q233_phrase_search",
    (s, d) => {
      val post = graft.ops.PhraseIndex.postings(Tables.documents(s, d), "doc_id", "text")
      val phrases = Seq(
        "batch batch",
        "the fast")
      phrases.map { p =>
        graft.ops.PhraseIndex.phraseOccurrences(post, p.split(" ").toSeq)
          .agg(
            countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_occurrences"),
            coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
          .select(lit(p).as("phrase"), col("n_docs"), col("n_occurrences"), col("id_sum"))
      }.reduce(_.unionByName(_)).orderBy("phrase")
    },
    Some("""WITH base AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
                 tok AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, t[CAST(i AS INT)] AS term
                         FROM base, UNNEST(range(1, len(t) + 1)) AS u(i)),
                 m1 AS (SELECT doc_id, pos - idx AS anchor
                        FROM tok JOIN (VALUES ('batch', 0), ('batch', 1)) v(w, idx)
                          ON term = w
                        GROUP BY doc_id, pos - idx HAVING COUNT(DISTINCT idx) = 2),
                 m2 AS (SELECT doc_id, pos - idx AS anchor
                        FROM tok JOIN (VALUES ('the', 0), ('fast', 1)) v(w, idx)
                          ON term = w
                        GROUP BY doc_id, pos - idx HAVING COUNT(DISTINCT idx) = 2)
            SELECT 'batch batch' AS phrase,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_occurrences,
                   CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS id_sum
            FROM m1
            UNION ALL
            SELECT 'the fast', CAST(COUNT(DISTINCT doc_id) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT), CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
            FROM m2
            ORDER BY phrase"""),
    headline = true)

  /** Q234 — compression-ratio quality audit
    * ([[graft.functions.DeflateRatio]], the Gopher/MassiveText
    * repetitiveness gate): per-source document counts, mean deflate
    * ratio, and how many docs compress below the junk threshold.
    * zlib is engine-side only → rows-only check; DeflateRatioSpec pins
    * the ordering (repetitive < prose), the empty-text contract, and
    * eval/codegen/SQL-function agreement. */
  val q234 = QueryDef(
    "q234_compression_quality",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("ratio", graft.functions.DeflateRatio(col("text")))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          r4(avg(col("ratio"))).as("avg_ratio"),
          sum(when(col("ratio") < 0.35, 1L).otherwise(0L)).as("n_repetitive"))
        .orderBy("source"),
    None,
    headline = true)

  /** Q242 — Gopher repetition gate
    * ([[graft.functions.TextFunctions.topNgramFrac]], Rae et al. 2021
    * Table A1): per doc, the fraction of token/2-gram positions occupied
    * by the single most frequent token/2-gram, composed with q87's
    * duplicate-3-gram fraction into the published keep/drop rule. All
    * three signals are row-local nested-lambda counts over the token
    * array — one projection, zero shuffles, 100 TB-safe by construction.
    * The keep flag compares the UNROUNDED ratios (exact small-int
    * divisions, deterministic cross-engine); the oracle replays the same
    * list arithmetic in DuckDB. */
  val q242 = QueryDef(
    "q242_gopher_repetition",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          r6(TextFunctions.topNgramFrac(col("text"), 1)).as("top1_frac"),
          r6(TextFunctions.topNgramFrac(col("text"), 2)).as("top2_frac"),
          (TextFunctions.topNgramFrac(col("text"), 2) <= 0.18 &&
            TextFunctions.dupNgramFrac(col("text"), 3) <= 0.3).as("keep"))
        .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
           |     g AS (SELECT doc_id, ws,
           |             CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)),
           |               i -> ws[i] || ' ' || ws[i+1]) ELSE [] END AS g2,
           |             CASE WHEN len(ws) >= 3 THEN list_transform(range(1, len(ws) - 1),
           |               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) ELSE [] END AS g3
           |           FROM t),
           |     f AS (SELECT doc_id,
           |             CAST(list_max(list_transform(list_distinct(ws),
           |               x -> len(list_filter(ws, y -> y = x)))) AS DOUBLE)
           |               / len(ws) AS top1,
           |             CASE WHEN len(ws) < 2 THEN 0.0 ELSE
           |               CAST(list_max(list_transform(list_distinct(g2),
           |                 x -> len(list_filter(g2, y -> y = x)))) AS DOUBLE)
           |                 / len(g2) END AS top2,
           |             CASE WHEN len(ws) - 2 <= 0 THEN 0.0 ELSE
           |               1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
           |                 / (len(ws) - 2) END AS dup3
           |           FROM g)
           |SELECT doc_id, ROUND(top1, 6) AS top1_frac, ROUND(top2, 6) AS top2_frac,
           |       top2 <= 0.18 AND dup3 <= 0.3 AS keep
           |FROM f ORDER BY doc_id""".stripMargin))

  /** Q243 — perplexity bucketing (the CCNet recipe, Wenzek et al. 2020):
    * score every doc under the q123 unigram LM, cut the corpus into
    * head/middle/tail at the GLOBAL score terciles, and report per
    * (lang, bucket) counts + mean score — the standard "keep the head,
    * downsample the tail" curation signal. Terciles ride the q194
    * construction: ONE exact-percentile aggregate broadcast as a 2-double
    * row, bucket assignment a higher-order fold against it — no global
    * window, no rank shuffle. Scores are rounded to 6 BEFORE the
    * percentile so both engines cut the identical multiset. */
  val q243 = QueryDef(
    "q243_perplexity_buckets",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val scored = graft.ops.LangModel
        .scoreDocs(docs, graft.ops.LangModel.unigramCounts(docs))
        .select(col("doc_id"), r6(col("avg_logprob")).as("lp"))
        .join(docs.select("doc_id", "lang"), "doc_id")
      // 1D/3 forces DOUBLE division (plain 1.0/3 parses as DECIMAL(7,6),
      // which would both fail percentile's type check and cut at a
      // different point than DuckDB's double 1.0/3)
      val bounds = scored.agg(expr("percentile(lp, array(1D/3, 2D/3))").as("qs"))
      scored.crossJoin(broadcast(bounds))
        .select(
          col("lang"), col("lp"),
          expr("aggregate(qs, 0, (acc, q) -> acc + IF(lp > q, 1, 0))").as("nAbove"))
        .select(
          col("lang"),
          when(col("nAbove") === 2, "head")
            .when(col("nAbove") === 1, "middle")
            .otherwise("tail").as("bucket"),
          col("lp"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"), r4(avg(col("lp"))).as("mean_lp"))
        .orderBy("lang", "bucket")
    },
    Some("""WITH t AS (SELECT doc_id, unnest(str_split(text,' ')) AS token FROM documents),
           |     v AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY token),
           |     s AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total,
           |                  CAST(COUNT(*) AS DOUBLE) AS v_size FROM v),
           |     dt AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY doc_id, token),
           |     sc AS (SELECT doc_id,
           |                   ROUND(SUM(tf * LN((COALESCE(v.cnt, 0) + 1)
           |                     / (s.n_total + s.v_size))) / SUM(tf), 6) AS lp
           |            FROM dt LEFT JOIN v USING (token) CROSS JOIN s
           |            GROUP BY doc_id),
           |     sl AS (SELECT sc.doc_id, sc.lp, d.lang
           |            FROM sc JOIN documents d USING (doc_id)),
           |     b AS (SELECT quantile_cont(lp, [1.0/3, 2.0/3]) AS qs FROM sl)
           |SELECT lang,
           |       CASE len(list_filter(b.qs, q -> sl.lp > q))
           |         WHEN 2 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
           |       COUNT(*) AS n_docs, ROUND(AVG(lp), 4) AS mean_lp
           |FROM sl, b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Q261 — cross-source duplication matrix ("which sources copy from
    * each other"): q88's deterministic rare-shingle duplicate edges,
    * attributed to their endpoints' sources and counted per unordered
    * source pair — the provenance-level view of near-duplication that
    * decides which FEEDS to dedup against each other (diagonal entries =
    * intra-source duplication). Edge build is the q88 single keyed
    * aggregation; attributing them is two doc-keyed joins on the TINY
    * edge set. Same hash-vs-string-shingle oracle equivalence as q88. */
  val q261 = QueryDef(
    "q261_source_dup_matrix",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .filter(TextFunctions.tokenCount(col("text")) >= 3)
      val edges = docs.select(
          col("doc_id"),
          explode(graft.functions.ShingleHashSetExpr(
            TextFunctions.tokens(col("text")), 3)).as("h"))
        .groupBy("h").agg(
          count(lit(1)).as("df"),
          min(col("doc_id")).as("src"),
          max(col("doc_id")).as("dst"))
        .filter(col("df") === 2)
        .select("src", "dst")
        .distinct()
      val srcOf = docs.select(col("doc_id"), col("source"))
      edges
        .join(srcOf.select(col("doc_id").as("src"), col("source").as("sa")), "src")
        .join(srcOf.select(col("doc_id").as("dst"), col("source").as("sb")), "dst")
        .select(
          least(col("sa"), col("sb")).as("src_a"),
          greatest(col("sa"), col("sb")).as("src_b"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("dup_edges"))
        .orderBy("src_a", "src_b")
    },
    Some("""WITH tok AS (SELECT doc_id, source, str_split(text, ' ') AS t FROM documents
           |             WHERE len(str_split(text, ' ')) >= 3),
           |     sh AS (SELECT DISTINCT doc_id, s FROM (
           |              SELECT doc_id,
           |                     UNNEST(list_transform(range(1, len(t) - 1),
           |                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
           |              FROM tok)),
           |     rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) = 2),
           |     edges AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
           |               FROM sh a JOIN rare USING (s) JOIN sh b USING (s)
           |               WHERE a.doc_id < b.doc_id),
           |     lab AS (SELECT e.src, e.dst, ta.source AS sa, tb.source AS sb
           |             FROM edges e JOIN tok ta ON ta.doc_id = e.src
           |                          JOIN tok tb ON tb.doc_id = e.dst)
           |SELECT LEAST(sa, sb) AS src_a, GREATEST(sa, sb) AS src_b,
           |       COUNT(*) AS dup_edges
           |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Q264 — content-defined chunking audit
    * ([[graft.ops.ContentChunking]], the rsync/LBFS boundary trick):
    * chunk where the rolling 3-token hash hits 0 mod 8, then the
    * per-source chunk-dedup picture — total vs distinct chunks is the
    * sub-document duplication fixed windows miss after an edit shifts
    * alignment. The md5-uniform boundary makes the EXACT chunking
    * DuckDB-replayable; the oracle rebuilds every boundary, chunk id,
    * and chunk string. */
  val q264 = QueryDef(
    "q264_content_chunks",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.ContentChunking.chunks(docs, "text", "doc_id")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_chunks"),
          countDistinct(col("chunk_text")).as("distinct_chunks"),
          r6(avg(col("n_tokens"))).as("avg_len"),
          sum(col("n_tokens")).as("tok_sum"))
        .orderBy("source")
    },
    Some("""WITH t AS (SELECT doc_id, source, str_split(text, ' ') AS ws FROM documents
           |           WHERE trim(text) <> ''),
           |     p AS (SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
           |                  ws[CAST(i + 1 AS INT)] AS tok,
           |                  CASE WHEN i >= 2 AND
           |                    CAST(('0x' || substr(md5('cdc-v1:' ||
           |                      array_to_string(ws[CAST(i - 1 AS INT):CAST(i + 1 AS INT)], ' ')),
           |                      1, 8)) AS BIGINT) % 8 = 0
           |                  THEN 1 ELSE 0 END AS flag
           |           FROM t, UNNEST(range(len(ws))) AS u(i)),
           |     c AS (SELECT doc_id, source, pos, tok,
           |                  CAST(COALESCE(SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
           |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |                    AS BIGINT) AS chunk_id
           |           FROM p),
           |     ch AS (SELECT doc_id, source, chunk_id,
           |                   string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
           |                   COUNT(*) AS n_tok
           |            FROM c GROUP BY 1, 2, 3)
           |SELECT source, COUNT(*) AS n_chunks,
           |       CAST(COUNT(DISTINCT chunk_text) AS BIGINT) AS distinct_chunks,
           |       ROUND(AVG(n_tok), 6) AS avg_len,
           |       CAST(SUM(n_tok) AS BIGINT) AS tok_sum
           |FROM ch GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Q265 — chunk-level dedup STRIP (the action on q264's audit, the
    * q137→q144 pattern at chunk granularity): every repeated
    * content-defined chunk keeps its FIRST occurrence corpus-wide
    * ((doc_id, chunk_id)-min — deterministic) and later copies are
    * stripped; per-source token accounting shows the savings. Keep
    * selection is one chunk-text-keyed aggregate; the oracle rebuilds
    * the identical chunking and first-occurrence rule. */
  val q265 = QueryDef(
    "q265_chunk_dedup_strip",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val ch = graft.ops.ContentChunking.chunks(docs, "text", "doc_id")
      val keep = ch.groupBy("chunk_text")
        .agg(min(struct(col("doc_id"), col("chunk_id"))).as("k"))
        .select(col("chunk_text"), col("k.doc_id").as("_kd"), col("k.chunk_id").as("_kc"))
      val kept = ch.join(keep, Seq("chunk_text"))
        .filter(col("doc_id") === col("_kd") && col("chunk_id") === col("_kc"))
      ch.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source").agg(sum("n_tokens").as("toks_before"))
        .join(
          kept.join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source").agg(sum("n_tokens").as("toks_after")),
          Seq("source"), "left")
        .select(
          col("source"), col("toks_before"),
          coalesce(col("toks_after"), lit(0L)).as("toks_after"),
          r6(lit(1.0) - coalesce(col("toks_after"), lit(0L)) / col("toks_before"))
            .as("strip_frac"))
        .orderBy("source")
    },
    Some("""WITH t AS (SELECT doc_id, source, str_split(text, ' ') AS ws FROM documents
           |           WHERE trim(text) <> ''),
           |     p AS (SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
           |                  ws[CAST(i + 1 AS INT)] AS tok,
           |                  CASE WHEN i >= 2 AND
           |                    CAST(('0x' || substr(md5('cdc-v1:' ||
           |                      array_to_string(ws[CAST(i - 1 AS INT):CAST(i + 1 AS INT)], ' ')),
           |                      1, 8)) AS BIGINT) % 8 = 0
           |                  THEN 1 ELSE 0 END AS flag
           |           FROM t, UNNEST(range(len(ws))) AS u(i)),
           |     c AS (SELECT doc_id, source, pos, tok,
           |                  CAST(COALESCE(SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
           |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |                    AS BIGINT) AS chunk_id
           |           FROM p),
           |     ch AS (SELECT doc_id, source, chunk_id,
           |                   string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
           |                   COUNT(*) AS n_tok
           |            FROM c GROUP BY 1, 2, 3),
           |     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY chunk_text
           |                      ORDER BY doc_id, chunk_id) AS rn FROM ch),
           |     b AS (SELECT source, SUM(n_tok) AS toks_before FROM ch GROUP BY 1),
           |     a AS (SELECT source, SUM(n_tok) AS toks_after FROM r
           |           WHERE rn = 1 GROUP BY 1)
           |SELECT b.source, CAST(b.toks_before AS BIGINT) AS toks_before,
           |       CAST(COALESCE(a.toks_after, 0) AS BIGINT) AS toks_after,
           |       ROUND(1.0 - CAST(COALESCE(a.toks_after, 0) AS DOUBLE) / b.toks_before, 6)
           |         AS strip_frac
           |FROM b LEFT JOIN a USING (source) ORDER BY source""".stripMargin))


  /** Q274 — duplicate-cluster size histogram: q88's connected components
    * summarized as "how many clusters of each size" — the one-line
    * duplication-severity readout (a corpus of pairs dedups cheaply; a
    * few giant clusters mean template spam). Same edge build and CC
    * loop; two bounded aggregations on the labels. The oracle extends
    * q88's recursive-CTE components with the same double grouping. */
  val q274 = QueryDef(
    "q274_dup_cluster_sizes",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .filter(TextFunctions.tokenCount(col("text")) >= 3)
      val edges = docs.select(
          col("doc_id"),
          explode(graft.functions.ShingleHashSetExpr(
            TextFunctions.tokens(col("text")), 3)).as("h"))
        .groupBy("h").agg(
          count(lit(1)).as("df"),
          min(col("doc_id")).as("src"),
          max(col("doc_id")).as("dst"))
        .filter(col("df") === 2)
        .select("src", "dst")
        .distinct()
      val (labels, _) = ConnectedComponents.label(edges)
      labels.groupBy("comp").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
        .orderBy("sz")
    },
    Some("""WITH RECURSIVE
           |  tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents
           |          WHERE len(str_split(text, ' ')) >= 3),
           |  sh AS (SELECT DISTINCT doc_id, s FROM (
           |           SELECT doc_id,
           |                  UNNEST(list_transform(range(1, len(t) - 1),
           |                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
           |           FROM tok)),
           |  rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) = 2),
           |  edges AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
           |            FROM sh a JOIN rare USING (s) JOIN sh b USING (s)
           |            WHERE a.doc_id < b.doc_id),
           |  sym AS (SELECT src, dst FROM edges
           |          UNION SELECT dst AS src, src AS dst FROM edges),
           |  reach(a, b) AS (SELECT src, dst FROM sym
           |                  UNION
           |                  SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
           |  comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a),
           |  cs AS (SELECT comp, COUNT(*) AS sz FROM comp GROUP BY 1)
           |SELECT CAST(sz AS BIGINT) AS sz, COUNT(*) AS n_clusters
           |FROM cs GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q330 — PII redaction audit ([[graft.ops.PiiScrub]]): the scrub
    * stage a corpus release runs between quality filtering and packing —
    * emails / phones / IPv4 to stable placeholders, with per-document
    * redaction counts as the audit trail. The fixture text carries no
    * PII, so the query INJECTS it deterministically from doc_id (CASE
    * order mirrored in the oracle) and the oracle replays injection,
    * counting, and the ordered three-pass replacement byte-for-byte —
    * the patterns live in the RE2 ∩ Java regex subset precisely so this
    * cross-engine replay is possible. Row-local codegen end to end:
    * zero shuffles added to any pipeline this stage joins. */
  val q330 = QueryDef(
    "q330_pii_redaction",
    (s, d) => {
      import graft.ops.PiiScrub
      val injected = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .withColumn("t2",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com now")))
            .when(col("doc_id") % 11 === 0,
              concat(col("text"), lit(" call +1 555-123-4567 or ping 10.0."),
                (col("doc_id") % 256).cast("string"), lit(".7 ok")))
            .otherwise(col("text")))
      injected.select(
          col("doc_id"),
          PiiScrub.countEmails(col("t2")).cast("long").as("n_emails"),
          PiiScrub.countPhones(col("t2")).cast("long").as("n_phones"),
          PiiScrub.countIpv4(col("t2")).cast("long").as("n_ips"),
          PiiScrub.redact(col("t2")).as("red"))
        .filter(col("n_emails") + col("n_phones") + col("n_ips") > 0)
        .select(
          col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
          expr("right(red, 40)").as("redacted_tail"))
        .orderBy("doc_id")
    },
    Some("""WITH inj AS (SELECT doc_id,
           |                    CASE WHEN doc_id % 7 = 0
           |                         THEN text || ' contact user' ||
           |                              CAST(doc_id AS VARCHAR) || '@example.com now'
           |                         WHEN doc_id % 11 = 0
           |                         THEN text || ' call +1 555-123-4567 or ping 10.0.' ||
           |                              CAST(doc_id % 256 AS VARCHAR) || '.7 ok'
           |                         ELSE text END AS t2
           |             FROM documents),
           |     c AS (SELECT doc_id,
           |                  CAST(len(regexp_extract_all(t2,
           |                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
           |                    AS BIGINT) AS n_emails,
           |                  CAST(len(regexp_extract_all(t2,
           |                    '\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}([- ][0-9]{3,4})?'))
           |                    AS BIGINT) AS n_phones,
           |                  CAST(len(regexp_extract_all(t2,
           |                    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
           |                    AS BIGINT) AS n_ips,
           |                  regexp_replace(regexp_replace(regexp_replace(t2,
           |                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           |                    '<EMAIL>', 'g'),
           |                    '\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}([- ][0-9]{3,4})?',
           |                    '<PHONE>', 'g'),
           |                    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
           |                    '<IP>', 'g') AS red
           |           FROM inj)
           |SELECT doc_id, n_emails, n_phones, n_ips, right(red, 40) AS redacted_tail
           |FROM c WHERE n_emails + n_phones + n_ips > 0 ORDER BY doc_id""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(q22, q26, q27, q28, q29, q33, q34, q35, q36, q37, q73, q74, q80, q83,
      q84, q85, q86, q87, q88, q101, q106, q108, q112, q113, q114, q115, q119, q122, q123,
      q125, q126, q128, q137, q138, q144, q148, q154, q161, q173, q175,
      q181, q182, q183, q190, q191, q210, q211, q218, q220, q225, q226, q233, q234,
      q242, q243, q261, q264, q265, q274, q330)
}
