package graft

import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, Registry, Vectors}

class CosineExprSpec extends SparkSuite {
  import spark.implicits._

  /** ConvertToLocalRelation folds a Project over a `toDF` LocalRelation at
    * OPTIMIZE time with an InterpretedMutableProjection — doGenCode never
    * runs, so a codegen-mode assertion over local fixtures is vacuous
    * without excluding the rule (verified: with the rule on, the optimized
    * plan is a bare LocalRelation).
    */
  private def withLocalRelationsKeptPhysical[A](body: => A): A = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
      body
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("fused expression equals composed zip_with/aggregate form bit-for-bit") {
    val rng = new scala.util.Random(7)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val e = vecs.select(col("vec_id"), Vectors.asDouble(col("embedding")).as("emb"))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("emb").as("p_emb"))
    val both = e.filter(col("vec_id") =!= 0)
      .crossJoin(probe)
      .select(
        CosineSimilarity(col("emb"), col("p_emb")).as("fused"),
        Vectors.cosine(col("emb"), col("p_emb")).as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "fused and composed cosine diverged")
    }
  }

  test("expression is SQL-callable after registration") {
    Registry.registerAll(spark)
    val got = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s,\n" +
      "       cosine_similarity(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS o")
      .collect()(0)
    assert(got.getDouble(0) == 1.0 && got.getDouble(1) == 0.0)
  }

  test("fused minhash signature equals the composed-column form") {
    import graft.functions.MinHashSigExpr
    import graft.ops.Dedup
    val rng = new scala.util.Random(11)
    val docs = (0 until 100).map(i =>
      (i.toLong, Seq.fill(50)(rng.nextLong()))).toDF("id", "hs")
    val rows = docs.select(
      MinHashSigExpr(col("hs"), 32).as("fused"),
      Dedup.minhashSignature(col("hs"), 32).as("composed"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "fused and composed minhash diverged")
    }
  }

  test("fully-fused band keys equal the composed shingle→sig→band chain") {
    import graft.functions.MinHashBandKeysExpr
    import graft.ops.Dedup
    val rng = new scala.util.Random(13)
    val docs = (0 until 100).map { i =>
      (i.toLong, Seq.fill(2 + rng.nextInt(40))(s"tok${rng.nextInt(500)} g${rng.nextInt(99)}"))
    }.toDF("id", "sh")
    val rows = docs.select(
      MinHashBandKeysExpr(col("sh"), 32, 8).as("fused"),
      Dedup.bandKeys(
        graft.functions.MinHashSigExpr(Dedup.shingleHashes(col("sh")), 32), 8, 4).as("composed"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "fused and composed band keys diverged")
    }
  }

  test("fused minhash expressions: interpreted eval equals codegen") {
    // Spark silently falls back to interpreted eval when codegen fails —
    // the nullSafeEval path must produce identical results.
    import graft.functions.{MinHashBandKeysFromHashesExpr, ShingleHashSetExpr}
    val rng = new scala.util.Random(17)
    val docs = (0 until 50).map { i =>
      (i.toLong, Seq.fill(3 + rng.nextInt(30))(s"w${rng.nextInt(200)}"))
    }.toDF("id", "toks")
    def run() = docs.select(
      ShingleHashSetExpr(col("toks"), 3).as("hs"),
      MinHashBandKeysFromHashesExpr(ShingleHashSetExpr(col("toks"), 3), 32, 8).as("keys"))
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1))).toSeq
    withLocalRelationsKeptPhysical {
      val withCodegen = run()
      val prev = spark.conf.get("spark.sql.codegen.wholeStage")
      val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      try {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        assert(run() == withCodegen, "interpreted eval diverged from codegen")
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", prev)
        spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
      }
    }
  }

  test("every custom expression COMPILES under CODEGEN_ONLY (no silent fallback)") {
    // The parity test above cannot catch a broken doGenCode: a compile
    // failure silently degrades to nullSafeEval and both sides still agree.
    // CODEGEN_ONLY turns the Janino failure into a thrown error — this is
    // the gate that would have caught the `MODULE$`-on-the-wrong-class bug
    // that ran round 5's whole bench interpreted.
    import graft.functions.{
      CanonicalTextExpr, InterleaveBits, MinHashBandKeysExpr, MinHashBandKeysFromHashesExpr,
      MinHashSigExpr, ShingleHashSetExpr, SimHashSigExpr
    }
    val rng = new scala.util.Random(19)
    val docs = (0 until 20).map { i =>
      (i.toLong,
        Seq.fill(3 + rng.nextInt(20))(s"w${rng.nextInt(100)}"),
        Seq.fill(30)(rng.nextLong()),
        Array.fill(16)(rng.nextGaussian()))
    }.toDF("id", "toks", "hs", "emb")
    val prevWs = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    // Without withLocalRelationsKeptPhysical this whole gate is vacuous:
    // the Project over the local fixture would be folded away at optimize
    // time (interpreted) and CODEGEN_ONLY would never see the expressions.
    withLocalRelationsKeptPhysical {
      try {
        // wholeStage off so projections hit the expression-codegen factory
        // directly; CODEGEN_ONLY makes that factory throw on compile failure.
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        val df = docs.select(
          ShingleHashSetExpr(col("toks"), 3).as("shs"),
          MinHashBandKeysExpr(col("toks"), 32, 8).as("bk"),
          MinHashBandKeysFromHashesExpr(ShingleHashSetExpr(col("toks"), 3), 32, 8).as("bkh"),
          MinHashSigExpr(col("hs"), 32).as("sig"),
          SimHashSigExpr(col("hs")).as("sim"),
          CosineSimilarity(col("emb"), col("emb")).as("cos"),
          InterleaveBits(col("id"), col("id")).as("z"),
          CanonicalTextExpr(concat_ws(" ", col("toks"))).as("canon"))
        // The gate only bites if the projection actually survives to
        // execution — assert the optimized plan still computes it.
        assert(
          df.queryExecution.optimizedPlan.collect {
            case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
          }.nonEmpty,
          s"fixture was constant-folded; gate is vacuous:\n${df.queryExecution.optimizedPlan}")
        assert(df.collect().length == 20)
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", prevWs)
        spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
      }
    }
  }

  test("null input yields null, mismatched lengths use common prefix") {
    val df = Seq((Some(Array(1.0, 0.0)), None: Option[Array[Double]])).toDF("a", "b")
    val r = df.select(CosineSimilarity(col("a"), col("b")).as("s")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("whole-stage codegen covers the fused expression") {
    val e = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(2.0f, 1.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("emb"))
    val df = e.crossJoin(e.select(col("emb").as("p_emb")))
      .select(CosineSimilarity(col("emb"), col("p_emb")).as("s"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` marks operators inside a WholeStageCodegen stage
    assert(
      plan.matches("(?s).*\\*\\(\\d+\\) Project \\[cosine_similarity.*"),
      s"fused expression not inside a codegen stage:\n$plan")
  }
}
