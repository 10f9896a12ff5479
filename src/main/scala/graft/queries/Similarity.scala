package graft.queries

import org.apache.spark.sql.functions._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window

import graft.core.Fmt.{r4, r6}
import graft.core.Tables
import graft.ops.{Ann, Bm25, Embeddings, SemDedup}

/** Similarity-search queries over the `embeddings` table (SURVEY.md §2.11
  * X3 / §2.13 Q21). Exact brute-force cosine is the baseline + oracle path;
  * LSH bucketing is the scale path (rows-only check, recall asserted in
  * the ScalaTest spec against the brute-force result).
  */
object Similarity {

  /** Q21 — exact top-3 cosine neighbors of vec_id=0 (declared §2.13 Q21). */
  val q21 = QueryDef(
    "q21_cosine_topk",
    (s, d) => {
      val corpus = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
      val probe = corpus.filter(col("vec_id") === 0)
      Ann.bruteForceTopK(corpus, probe, 3)
        .select("vec_id", "sim")
        .orderBy(col("sim").desc, col("vec_id"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
                 p AS (SELECT emb AS pe FROM e WHERE vec_id = 0)
            SELECT vec_id, ROUND(list_cosine_similarity(emb, pe), 6) AS sim
            FROM e, p WHERE vec_id <> 0
            ORDER BY sim DESC, vec_id LIMIT 3"""),
    headline = true)

  /** Q30 — embedding-cosine near-dup pairs above 0.2 for a FIXED-SIZE
    * probe set (the 20 lowest vec_ids) — the embedding variant of dedup
    * (X2/X3). A proportional probe set (`vec_id % 50`) would make this
    * exact baseline O(n²/50) pair generation as the corpus grows; the
    * constant cap keeps it one 20-row broadcast against the scan, O(n)
    * (VERDICT r1 item 3). */
  val q30 = QueryDef(
    "q30_embedding_neardup",
    (s, d) => {
      val corpus = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
      val probes = corpus.orderBy("vec_id").limit(20)
      Ann.nearDupPairs(corpus, probes, 0.2).orderBy("probe_id", "vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
                 p AS (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 20),
                 j AS (SELECT a.vec_id AS probe_id, b.vec_id AS vec_id,
                              ROUND(list_cosine_similarity(b.emb, a.emb), 6) AS sim
                       FROM p a JOIN e b ON b.vec_id > a.vec_id)
            SELECT probe_id, vec_id, sim FROM j WHERE sim >= 0.2
            ORDER BY probe_id, vec_id"""))

  /** Q31 — brute-force cosine top-5 per probe: the exact ANN baseline.
    * Probes are a FIXED-SIZE set (20 lowest vec_ids) — a proportional set
    * (`vec_id % 100`) would grow the exact O(|probes|*|corpus|) pass
    * quadratically with the corpus; the cap keeps the baseline O(n). */
  val q31 = QueryDef(
    "q31_ann_topk_brute",
    (s, d) => {
      val corpus = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
      val probes = corpus.orderBy("vec_id").limit(20)
      Ann.bruteForceTopK(corpus, probes, 5).orderBy("probe_id", "vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
                 p AS (SELECT vec_id AS probe_id, emb AS pe FROM e ORDER BY vec_id LIMIT 20),
                 j AS (SELECT probe_id, vec_id,
                              ROUND(list_cosine_similarity(emb, pe), 6) AS sim
                       FROM e, p WHERE vec_id <> probe_id),
                 r AS (SELECT probe_id, vec_id, sim,
                              ROW_NUMBER() OVER (PARTITION BY probe_id
                                                 ORDER BY sim DESC, vec_id) AS rn
                       FROM j)
            SELECT probe_id, vec_id, sim FROM r WHERE rn <= 5
            ORDER BY probe_id, vec_id"""),
    headline = true)

  /** Q32 — LSH-bucketed approximate top-5 (6 random hyperplanes → 64
    * buckets): the scale path. Engine-only (bucket assignment depends on
    * the seeded planes) → rows-only check; recall vs q31 asserted in spec. */
  val q32 = QueryDef(
    "q32_ann_topk_lsh",
    (s, d) => {
      val corpus = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
      val probes = corpus.orderBy("vec_id").limit(20)
      Ann.lshTopK(corpus, probes, 5, nPlanes = 6, dim = 64).orderBy("probe_id", "vec_id")
    },
    None)

  /** Q54 — array scalar functions over the embedding column (SURVEY §2.8
    * extension set: size/element_at/aggregate). */
  val q54 = QueryDef(
    "q54_array_ops",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("first_v"),
          round(
            aggregate(col("embedding").cast("array<double>"), lit(0.0), (a, x) => a + x), 6)
            .as("sum_v"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id, CAST(LEN(embedding) AS INTEGER) AS dim,
                   ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_v,
                   ROUND(list_sum(CAST(embedding AS DOUBLE[])), 6) AS sum_v
            FROM embeddings ORDER BY vec_id"""))

  /** Q67 — IVF approximate top-5 (k-means coarse quantizer, nlist=16,
    * nprobe=4): the billion-scale ANN layout. Engine-only (k-means
    * internals) → rows-only; recall vs q31 asserted in spec. Index build
    * and query are SEPARATE steps ([[Ann.buildIvfIndex]]/[[Ann.queryIvf]]);
    * this entry pays the one build it needs, and IvfIndexSpec shows two
    * query rounds reusing a single build. */
  val q67 = QueryDef(
    "q67_ann_topk_ivf",
    (s, d) => {
      val corpus = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
      val probes = corpus.orderBy("vec_id").limit(20)
      Ann.queryIvf(
        Ann.buildIvfIndex(corpus, nlist = 16), probes, 5, nprobe = 4)
        .orderBy("probe_id", "vec_id")
    },
    None)

  /** Q89 — embedding preprocessing (X3 front end): L2 normalization and
    * int8 scalar quantization ([[Embeddings]]). The oracle recomputes the
    * fold-ordered norm and the full quantized vector (sum + extrema), so
    * an off-by-one in the scale, a wrong clamp, or a reordered reduction
    * hash-fails; `unit_norm` pins the normalized copy to length 1. */
  val q89 = QueryDef(
    "q89_embedding_quantize",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val withUnit = Embeddings.l2Normalized(e, "v", "vn")
      Embeddings.quantizeInt8(withUnit, "v", "q")
        .select(
          col("vec_id"),
          r6(Embeddings.l2Norm(col("v"))).as("norm"),
          r6(Embeddings.l2Norm(col("vn"))).as("unit_norm"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("qsum"),
          array_min(col("q")).as("qmin"),
          array_max(col("q")).as("qmax"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                 s AS (SELECT vec_id, v,
                              sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS norm,
                              list_aggregate(v, 'min') AS lo,
                              (list_aggregate(v, 'max') - list_aggregate(v, 'min')) / 255.0 AS sc
                       FROM e),
                 q AS (SELECT vec_id, norm,
                              CASE WHEN sc = 0 THEN list_transform(v, x -> 0)
                                   ELSE list_transform(v,
                                     x -> CAST(LEAST(FLOOR((x - lo) / sc), 255.0) AS INTEGER)) END AS qv
                       FROM s)
            SELECT vec_id,
                   ROUND(norm, 6) AS norm,
                   CAST(CASE WHEN norm = 0 THEN 0.0 ELSE 1.0 END AS DOUBLE) AS unit_norm,
                   CAST(list_sum(qv) AS BIGINT) AS qsum,
                   CAST(list_aggregate(qv, 'min') AS INTEGER) AS qmin,
                   CAST(list_aggregate(qv, 'max') AS INTEGER) AS qmax
            FROM q ORDER BY vec_id"""))

  /** Q117 — semantic dedup ([[graft.ops.SemDedup]], the SemDeDup
    * construction): k-means cells bound the pair space, within-cell cosine
    * pairs above 0.3 collapse to one representative per connected group.
    * k-means internals are engine-specific → rows-only; SemDedupSpec
    * asserts (on a planted-duplicate fixture) pair exactness vs brute
    * force, recall of planted near-identical pairs, keep-one semantics,
    * and the oversized-cell subdivision bound. */
  val q117 = QueryDef(
    "q117_semantic_dedup",
    (s, d) => {
      val corpus = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
      val pairs = SemDedup.nearDupPairs(corpus, nClusters = 16, minSim = 0.3)
      val survivors = SemDedup.representatives(corpus, pairs)
      corpus.agg(count(lit(1)).as("n_total"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors")))
    },
    None)

  /** Q124 — SEMANTIC decontamination ([[graft.ops.Decontaminate
    * .semanticOverlap]], complementing q95's exact n-gram check):
    * paraphrased benchmark leakage shares no n-grams but lands close in
    * embedding space, so every corpus vector reports its max cosine to
    * the (fixed-size, broadcast) benchmark set and a flag at the 0.25
    * bar. The flag compares the ROUNDED similarity in both engines, so
    * the boundary is engine-agnostic. */
  val q124 = QueryDef(
    "q124_semantic_decontaminate",
    (s, d) => {
      val all = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
      val bench = all.orderBy("vec_id").limit(20)
      val corpus = all.join(bench.select("vec_id"), Seq("vec_id"), "left_anti")
      graft.ops.Decontaminate.semanticOverlap(corpus, bench)
        .select(col("vec_id"), r6(col("max_bench_sim")).as("max_bench_sim"))
        .withColumn("flagged", col("max_bench_sim") >= 0.25)
        .orderBy("vec_id")
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
                 b AS (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 20),
                 c AS (SELECT * FROM e WHERE vec_id NOT IN (SELECT vec_id FROM b)),
                 m AS (SELECT c.vec_id, MAX(list_cosine_similarity(c.emb, b.emb)) AS ms
                       FROM c CROSS JOIN b GROUP BY c.vec_id)
            SELECT vec_id, ROUND(ms, 6) AS max_bench_sim,
                   ROUND(ms, 6) >= 0.25 AS flagged
            FROM m ORDER BY vec_id"""))

  /** Q145 — product-quantized ANN top-5 ([[graft.ops.Pq]]): the corpus
    * compresses 32× (64-dim floats → 8 one-byte codes) and every probe
    * scores the WHOLE compressed corpus via ADC table lookups with
    * bounded per-partition heaps — the memory-bound scale path beside
    * q31 (exact), q32 (LSH) and q67 (IVF). Rows-only by the q32
    * convention (k-means codebooks are engine-seeded); PqSpec pins a
    * lossless grid corpus (ADC == exact cosine), recall vs brute force,
    * code-shape invariants, and determinism. */
  val q145 = QueryDef(
    "q145_ann_topk_pq",
    (s, d) => {
      val corpus = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
      val cb = graft.ops.Pq.train(corpus, m = 8, ksub = 16)
      val probes = corpus.orderBy("vec_id").limit(20)
      graft.ops.Pq.queryTopK(graft.ops.Pq.encode(corpus, cb), cb, probes, 5)
        .orderBy("probe_id", "vec_id")
    },
    None)

  /** Q158 — per-label centroid similarity matrix: the corpus-level
    * "how close are these clusters/sources semantically" audit (the
    * embedding-space counterpart of q154's lexical overlap). Component
    * sums shuffle on (label, pos) — fully parallel, dimension-bounded per
    * label — centroids assemble per label (≤ dim rows each), and the
    * label×label cosine is a broadcast self-join over #labels rows.
    * Nothing is ever all-pairs over VECTORS, only over labels. */
  val q158 = QueryDef(
    "q158_centroid_similarity",
    (s, d) => {
      val comp = Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("v").cast("double")).as("m"))
      val cents = comp.groupBy(col("label"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("c"))
      val a = cents.select(col("label").as("label_a"), col("c").as("ca"))
      val b = cents.select(col("label").as("label_b"), col("c").as("cb"))
      a.join(broadcast(b), col("label_a") < col("label_b"))
        .select(
          col("label_a"), col("label_b"),
          round(graft.functions.Vectors.cosine(col("ca"), col("cb")), 4).as("cos"))
        .orderBy("label_a", "label_b")
    },
    Some("""WITH u AS (SELECT label, unnest(range(len(embedding))) AS pos,
                              CAST(unnest(embedding) AS DOUBLE) AS v
                       FROM embeddings),
                 c AS (SELECT label, pos, AVG(v) AS m FROM u GROUP BY 1, 2),
                 n AS (SELECT label, SQRT(SUM(m*m)) AS nrm FROM c GROUP BY 1),
                 dt AS (SELECT a.label AS label_a, b.label AS label_b,
                               SUM(a.m * b.m) AS dot
                        FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
                        GROUP BY 1, 2)
            SELECT dt.label_a, dt.label_b,
                   ROUND(dt.dot / (na.nrm * nb.nrm), 4) AS cos
            FROM dt JOIN n na ON na.label = dt.label_a
                    JOIN n nb ON nb.label = dt.label_b
            ORDER BY label_a, label_b"""))

  /** Q208 — embedding drift: per label, the cosine similarity between
    * the centroids of two halves of the collection (vec_id parity as the
    * period split) — the vector-space member of the drift family
    * (q203 numeric KS, q206 categorical chi²): a label whose live
    * embeddings moved scores below 1. ONE aggregation over the
    * position-exploded vectors computes both centroids (FILTER-style
    * conditional means per (label, position)), then a |labels|·dim
    * reduction forms the cosines — no vector ever collects. */
  val q208 = QueryDef(
    "q208_embedding_drift",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(
          col("label"),
          (col("vec_id") % 2).as("part"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
      e.groupBy("label", "pos")
        .agg(
          avg(when(col("part") === 0, col("v"))).as("cr"),
          avg(when(col("part") === 1, col("v"))).as("cl"))
        .groupBy("label")
        .agg(r4(
          sum(col("cr") * col("cl"))
            / (sqrt(sum(col("cr") * col("cr"))) * sqrt(sum(col("cl") * col("cl")))))
          .as("centroid_cos"))
        .orderBy("label")
    },
    Some("""WITH p AS (SELECT unnest(generate_series(1, 64)) AS pos),
           |e AS (SELECT label, vec_id % 2 AS part, p.pos, embedding[p.pos] AS v
           |      FROM embeddings, p),
           |c AS (SELECT label, pos,
           |        AVG(v) FILTER (WHERE part = 0) AS cr,
           |        AVG(v) FILTER (WHERE part = 1) AS cl
           |      FROM e GROUP BY 1, 2)
           |SELECT label,
           |       ROUND(SUM(cr * cl)
           |             / (SQRT(SUM(cr * cr)) * SQRT(SUM(cl * cl))), 4) AS centroid_cos
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q222 — PCA whitening of the embedding table
    * ([[Embeddings.fitWhitening]]/[[Embeddings.whiten]]): fit the top-8
    * whitening directions in ONE sufficient-statistics pass (O(d²) state,
    * no shuffle of vectors), project every embedding through pure array
    * expressions, and report per-component mean/variance of the whitened
    * space. Rows-only by design — the oracle language has no
    * eigendecomposition — with the identity-covariance contract pinned by
    * WhitenSpec; this query's own output makes the contract VISIBLE
    * (mean ≈ 0, variance ≈ 1 per kept component). */
  val q222 = QueryDef(
    "q222_pca_whiten",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val model = Embeddings.fitWhitening(emb, "embedding", d = 64, components = 8)
      Embeddings.whiten(emb, "embedding", model, "w")
        .select(posexplode(col("w")).as(Seq("component", "v")))
        .groupBy("component")
        .agg(
          count(lit(1)).as("n"),
          r6(avg(col("v"))).as("mean_v"),
          r6(var_samp(col("v"))).as("var_v"))
        .orderBy("component")
    },
    None)

  /** Q248 — SEMANTIC split-leakage audit
    * ([[graft.ops.Decontaminate.semanticLeakage]], the embedding twin of
    * q228's verbatim n-gram audit): after the standard hash split on
    * vec_id, every TEST embedding's max cosine against the TRAIN split —
    * paraphrased near-duplicates that cross the split undetected by
    * verbatim checks. Test side broadcasts (eval-sized by design), train
    * is scanned once, the aggregate shuffles test-count rows. Banded on
    * the ROUNDED max so the histogram cut is deterministic cross-engine;
    * the oracle replays the split hash and the full test×train cosine. */
  val q248 = QueryDef(
    "q248_semantic_split_leakage",
    (s, d) => {
      val bucket = conv(
        substring(md5(concat(lit("split-v1:"), col("vec_id").cast("string"))), 1, 4),
        16, 10).cast("int") % 100
      val e = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
        .withColumn("b", bucket)
      val train = e.filter(col("b") < 90).drop("b")
      val test = e.filter(col("b") >= 90).drop("b")
      graft.ops.Decontaminate.semanticLeakage(train, test)
        .select(col("probe_id"), r6(col("max_corpus_sim")).as("ms"))
        .groupBy(least(floor((col("ms") + 1) * 2), lit(3L)).cast("int").as("band"))
        .agg(
          count(lit(1)).as("n_docs"),
          r6(avg(col("ms"))).as("avg_sim"),
          sum(col("probe_id")).as("id_sum"))
        .orderBy("band")
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
           |                  CAST(('0x' || substr(md5('split-v1:' || CAST(vec_id AS VARCHAR)), 1, 4))
           |                       AS INTEGER) % 100 AS b
           |           FROM embeddings),
           |     tr AS (SELECT vec_id, emb FROM e WHERE b < 90),
           |     te AS (SELECT vec_id, emb FROM e WHERE b >= 90),
           |     m AS (SELECT te.vec_id,
           |                  ROUND(MAX(list_cosine_similarity(tr.emb, te.emb)), 6) AS ms
           |           FROM te CROSS JOIN tr GROUP BY te.vec_id)
           |SELECT CAST(LEAST(FLOOR((ms + 1) * 2), 3) AS INTEGER) AS band,
           |       COUNT(*) AS n_docs, ROUND(AVG(ms), 6) AS avg_sim,
           |       CAST(SUM(vec_id) AS BIGINT) AS id_sum
           |FROM m GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q258 — binary-embedding Hamming search (the sign-binarization ANN
    * baseline: 32× smaller vectors, XOR-cheap distances): embeddings
    * binarize by coordinate sign into bit-strings, and the fused
    * [[graft.functions.HammingDistance]] expression ranks the corpus
    * against a probe — deterministic end to end (unlike the LSH paths),
    * so the EXACT top-10 is oracle-checked, tie-broken on id. One
    * projection + one broadcast probe; the expression runs inside
    * whole-stage codegen over the scan. */
  val q258 = QueryDef(
    "q258_hamming_topk",
    (s, d) => {
      val bits = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
        .select(
          col("vec_id"),
          array_join(expr("transform(emb, v -> IF(v >= 0, '1', '0'))"), "").as("bits"))
      val probe = bits.filter(col("vec_id") === 0).select(col("bits").as("p_bits"))
      bits.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(
          col("vec_id"),
          graft.functions.HammingDistance(col("bits"), col("p_bits")).as("ham"))
        .orderBy(col("ham"), col("vec_id"))
        .limit(10)
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
           |     b AS (SELECT vec_id, array_to_string(list_transform(emb,
           |                    v -> CASE WHEN v >= 0 THEN '1' ELSE '0' END), '') AS bits
           |           FROM e),
           |     p AS (SELECT bits AS pb FROM b WHERE vec_id = 0)
           |SELECT vec_id, CAST(hamming(bits, pb) AS INTEGER) AS ham
           |FROM b, p WHERE vec_id <> 0
           |ORDER BY ham, vec_id LIMIT 10""".stripMargin))

  /** Q260 — dimensionality-truncation recall audit (the matryoshka
    * question: "can we store the first k dims instead of all of them?"):
    * recall@10 of brute-force cosine search in the k-dim prefix space
    * against the full-dimension ground truth, for k ∈ {4, 8, 16}, over a
    * fixed 20-probe panel. Cosine is scale-invariant so truncation needs
    * no renormalization; both ranks order on the ROUNDED similarity with
    * id tie-break (the [[Ann.bruteForceTopK]] discipline), so the exact
    * hit sets are engine-independent and the oracle replays the double
    * brute force per k. */
  val q260 = QueryDef(
    "q260_matryoshka_recall",
    (s, d) => {
      val e = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
      def topk(emb: org.apache.spark.sql.DataFrame) =
        Ann.bruteForceTopK(emb, emb.orderBy("vec_id").limit(20), 10)
          .select("probe_id", "vec_id")
      val full = topk(e)
      Seq(4, 8, 16).map { k =>
        topk(e.select(col("vec_id"), expr(s"slice(emb, 1, $k)").as("emb")))
          .join(full, Seq("probe_id", "vec_id"), "left_semi")
          .agg(r4(count(lit(1)) / lit(200.0)).as("recall"))
          .select(lit(k).as("k"), col("recall"))
      }.reduce(_.unionByName(_)).orderBy("k")
    },
    Some {
      def rankCte(name: String, sliceExpr: String => String) =
        s"""$name AS (SELECT probe_id, vec_id FROM (
           |  SELECT p.probe_id, e.vec_id,
           |         ROW_NUMBER() OVER (PARTITION BY p.probe_id
           |           ORDER BY ROUND(list_cosine_similarity(${sliceExpr("e.emb")},
           |                          ${sliceExpr("p.pe")}), 6) DESC, e.vec_id) AS rn
           |  FROM e JOIN p ON e.vec_id <> p.probe_id) WHERE rn <= 10)""".stripMargin
      val ks = Seq(4, 8, 16)
      val ctes = ks.map(k => rankCte(s"t$k", c => s"$c[1:$k]")).mkString(",\n")
      val selects = ks.map(k =>
        s"""SELECT $k AS k, ROUND(COUNT(*) / CAST(200 AS DOUBLE), 4) AS recall
           |FROM t$k JOIN fullr USING (probe_id, vec_id)""".stripMargin)
        .mkString("\nUNION ALL ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |p AS (SELECT vec_id AS probe_id, emb AS pe FROM e ORDER BY vec_id LIMIT 20),
         |${rankCte("fullr", identity)},
         |$ctes
         |$selects
         |ORDER BY k""".stripMargin
    })

  /** Q273 — MMR diverse retrieval ([[graft.ops.DiverseTopK]]): the
    * 10-result page for probe 0 selected by maximal marginal relevance
    * (λ = 0.7) — each pick trades relevance against similarity to what
    * is already on the page, killing near-duplicate result runs. k
    * sequential argmax rounds (greedy is inherently sequential) →
    * rows-only; DiverseTopKSpec hand-solves both λ regimes and pins
    * determinism under repartitioning. */
  val q273 = QueryDef(
    "q273_mmr_select",
    (s, d) => {
      import s.implicits._
      val e = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
      val probe = e.filter(col("vec_id") === 0)
        .select("emb").collect()(0).getSeq[Double](0)
      val scored = e.filter(col("vec_id") =!= 0)
        .withColumn("rel",
          graft.functions.CosineSimilarity(col("emb"), typedLit(probe)))
      graft.ops.DiverseTopK.mmr(scored, "vec_id", "emb", "rel", k = 10, lambda = 0.7)
        .zipWithIndex.map { case (id, i) => (i + 1, id) }
        .toDF("rank", "vec_id")
    },
    None)

  /** Ranks a branch's top-k result 1..k by (score desc, doc_id). The
    * branch arrives ALREADY bounded (TakeOrdered top-20), so the global
    * row_number is over ≤ k rows; the identity re-aggregation (ids are
    * unique) makes that boundedness explicit to PlanShapeSpec's
    * registry-wide unpartitioned-window guard, the same contract as the
    * per-bucket stats stitches. */
  private def rankTop(branch: DataFrame, score: String): DataFrame = {
    val bounded = branch.groupBy("doc_id").agg(max(col(score)).as(score))
    bounded.select(
      col("doc_id"),
      row_number().over(Window.orderBy(col(score).desc, col("doc_id"))).as("r"))
  }

  /** Q275 — reciprocal-rank-fusion hybrid retrieval: "more like item 0"
    * answered by BOTH the lexical index (BM25 over doc 0's distinct
    * tokens as the query) and the semantic index (cosine against
    * embedding 0), fused with the published RRF formula
    * Σ 1/(60 + rank) (Cormack et al., SIGIR'09) — the standard hybrid
    * search shape behind RAG retrieval stacks. Each branch is its own
    * scale-safe top-20 (BM25's postings-sized aggregation; the
    * broadcast-probe cosine scan), fusion is a 20∪20-row full-outer
    * join. The one driver read is doc 0's token set — bounded by a
    * single document, the same contract as shipping the probe embedding.
    * The oracle replays both scoring formulas, both rank lists, and the
    * fusion arithmetic end-to-end. */
  val q275 = QueryDef(
    "q275_rrf_hybrid",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val terms = docs.filter(col("doc_id") === 0)
        .select(explode(split(col("text"), " ")).as("t"))
        .distinct().collect().map(_.getString(0)).toSeq.sorted
      val lex = Bm25.topDocs(
        docs.filter(col("doc_id") =!= 0), "text", "doc_id", terms, topK = 20)
      val corpus = Ann.prepared(Tables.embeddings(s, d), "embedding", "vec_id")
      val sem = Ann
        .bruteForceTopK(corpus, corpus.filter(col("vec_id") === 0), 20)
        .select(col("vec_id").as("doc_id"), col("sim"))
      val rl = rankTop(lex, "score").withColumnRenamed("r", "r_lex")
      val rs = rankTop(sem, "sim").withColumnRenamed("r", "r_sem")
      rl.join(rs, Seq("doc_id"), "full_outer")
        .withColumn("rrf", r6(
          coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_sem")), lit(0.0))))
        .select(
          col("doc_id"),
          coalesce(col("r_lex"), lit(0)).as("r_lex"),
          coalesce(col("r_sem"), lit(0)).as("r_sem"),
          col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },
    Some("""WITH t AS (SELECT doc_id, UNNEST(str_split(text, ' ')) AS term
           |           FROM documents WHERE doc_id <> 0),
           |     q AS (SELECT DISTINCT UNNEST(str_split(text, ' ')) AS term
           |           FROM documents WHERE doc_id = 0),
           |     dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY 1),
           |     st AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM dl),
           |     p AS (SELECT t.term, t.doc_id, COUNT(*) AS tf
           |           FROM t JOIN q USING (term) GROUP BY 1, 2),
           |     df AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
           |     sc AS (SELECT p.doc_id,
           |                   ROUND(SUM(LN(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
           |                         * p.tf * (1.2 + 1.0)
           |                         / (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))), 6)
           |                     AS score
           |            FROM p JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
           |            GROUP BY 1),
           |     lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
           |             FROM (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT 20)),
           |     e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
           |     pe AS (SELECT emb FROM e WHERE vec_id = 0),
           |     sims AS (SELECT vec_id AS doc_id,
           |                     ROUND(list_cosine_similarity(e.emb, pe.emb), 6) AS sim
           |              FROM e, pe WHERE vec_id <> 0),
           |     sem AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS r
           |             FROM (SELECT * FROM sims WHERE NOT isnan(sim)
           |                   ORDER BY sim DESC, doc_id LIMIT 20)),
           |     f AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           |                  l.r AS r_lex, s.r AS r_sem
           |           FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
           |SELECT doc_id,
           |       CAST(COALESCE(r_lex, 0) AS INTEGER) AS r_lex,
           |       CAST(COALESCE(r_sem, 0) AS INTEGER) AS r_sem,
           |       ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + r_lex), 0)
           |             + COALESCE(CAST(1 AS DOUBLE) / (60 + r_sem), 0), 6) AS rrf
           |FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin))

  /** Q282 — nearest-centroid classifier evaluation: per-label centroids
    * of the embedding column, every vector classified to its nearest
    * centroid (squared euclidean), reported as a confusion matrix — the
    * ten-line sanity check ("are these labels even separable in
    * embedding space?") run before spending on a real probe classifier.
    * Centroids build from ONE (label, pos) aggregation (classes × dims
    * rows — bounded) and broadcast back; scoring is a row-local
    * `zip_with` fold over the 10-row centroid table, argmin via
    * `min(struct(dist, label))` — no window, no per-class scan.
    * Centroid components round to 6 decimals BEFORE the distance so the
    * only cross-engine arithmetic on unrounded parallel sums is the
    * AVG itself (error ~1e-15 against a 1e-6 grid); the fold then runs
    * in identical index order in both engines. */
  val q282 = QueryDef(
    "q282_centroid_confusion",
    (s, d) => {
      val e = Tables.embeddings(s, d).select(
        col("vec_id"), col("label"),
        graft.functions.Vectors.asDouble(col("embedding")).as("emb"))
      val centroids = e
        .select(col("label").as("c_label"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy("c_label", "pos").agg(avg(col("x")).as("c"))
        .groupBy("c_label")
        .agg(array_sort(collect_list(struct(col("pos"), r6(col("c")).as("c"))))
          .as("pc"))
        .select(col("c_label"), transform(col("pc"), p => p.getField("c")).as("cemb"))
      e.crossJoin(broadcast(centroids))
        .withColumn("dist", aggregate(
          zip_with(col("emb"), col("cemb"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
        .groupBy("vec_id", "label")
        .agg(min(struct(col("dist"), col("c_label"))).as("m"))
        .select(col("label"), col("m.c_label").as("pred"))
        .groupBy("label", "pred").agg(count(lit(1)).as("n"))
        .orderBy("label", "pred")
    },
    Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
           |           FROM embeddings),
           |     cp AS (SELECT e.label AS c_label, t.i AS pos, ROUND(AVG(emb[t.i]), 6) AS c
           |            FROM e, range(1, 65) t(i) GROUP BY 1, 2),
           |     cl AS (SELECT c_label, list(c ORDER BY pos) AS cemb FROM cp GROUP BY 1),
           |     sc AS (SELECT vec_id, label, c_label,
           |                   list_sum(list_transform(range(1, 65),
           |                     i -> (emb[i] - cemb[i]) * (emb[i] - cemb[i]))) AS dist
           |            FROM e CROSS JOIN cl),
           |     pr AS (SELECT label, c_label,
           |                   ROW_NUMBER() OVER (PARTITION BY vec_id
           |                     ORDER BY dist, c_label) AS rn
           |            FROM sc)
           |SELECT label, c_label AS pred, COUNT(*) AS n
           |FROM pr WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Q289 — simplified silhouette by label: per vector, a = distance to
    * its OWN label centroid, b = the nearest OTHER centroid, scored
    * (b−a)/max(a,b) and averaged per label — the clustering-quality
    * companion of q282's confusion matrix (silhouette says how tight and
    * separated the label regions are, not just the argmax). The
    * centroid-based form (Hruschka et al.) replaces the O(n²) pairwise
    * silhouette with one broadcast fold per vector — the only version
    * that survives 100 TB. Same rounded-centroid determinism contract as
    * q282. */
  val q289 = QueryDef(
    "q289_silhouette",
    (s, d) => {
      val e = Tables.embeddings(s, d).select(
        col("vec_id"), col("label"),
        graft.functions.Vectors.asDouble(col("embedding")).as("emb"))
      val centroids = e
        .select(col("label").as("c_label"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy("c_label", "pos").agg(avg(col("x")).as("c"))
        .groupBy("c_label")
        .agg(array_sort(collect_list(struct(col("pos"), r6(col("c")).as("c"))))
          .as("pc"))
        .select(col("c_label"), transform(col("pc"), p => p.getField("c")).as("cemb"))
      e.crossJoin(broadcast(centroids))
        .withColumn("dist", aggregate(
          zip_with(col("emb"), col("cemb"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
        .groupBy("vec_id", "label")
        .agg(
          min(when(col("c_label") === col("label"), col("dist"))).as("a"),
          min(when(col("c_label") =!= col("label"), col("dist"))).as("b"))
        .select(col("label"),
          ((col("b") - col("a")) / greatest(col("a"), col("b"))).as("sil"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), r6(avg(col("sil"))).as("mean_sil"))
        .orderBy("label")
    },
    Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
           |           FROM embeddings),
           |     cp AS (SELECT e.label AS c_label, t.i AS pos, ROUND(AVG(emb[t.i]), 6) AS c
           |            FROM e, range(1, 65) t(i) GROUP BY 1, 2),
           |     cl AS (SELECT c_label, list(c ORDER BY pos) AS cemb FROM cp GROUP BY 1),
           |     sc AS (SELECT vec_id, label, c_label,
           |                   list_sum(list_transform(range(1, 65),
           |                     i -> (emb[i] - cemb[i]) * (emb[i] - cemb[i]))) AS dist
           |            FROM e CROSS JOIN cl),
           |     ab AS (SELECT vec_id, label,
           |                   MIN(CASE WHEN c_label = label THEN dist END) AS a,
           |                   MIN(CASE WHEN c_label <> label THEN dist END) AS b
           |            FROM sc GROUP BY 1, 2)
           |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           |       ROUND(AVG((b - a) / GREATEST(a, b)), 6) AS mean_sil
           |FROM ab GROUP BY 1 ORDER BY 1""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(q21, q30, q31, q32, q54, q67, q89, q117, q124, q145, q158, q208, q222, q248,
      q258, q260, q273, q275, q282, q289)
}
