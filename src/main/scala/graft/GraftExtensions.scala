package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.bridge

import graft.functions.{CosineSimilarity, InterleaveBits, MinHashSigExpr, SimHashSigExpr, TextFunctions}
import graft.plans.{ApproxSwapRule, MvRewriteRule}

/** Engine extension point (SURVEY.md §4: `SparkSessionExtensions` is the
  * supported way to ship functions + optimizer rules WITHOUT a session
  * handle — `spark.sql.extensions=graft.GraftExtensions` makes every
  * session created by spark-submit/Thrift/Connect carry them, unlike
  * [[graft.functions.Registry]] whose temp functions live and die with one
  * session).
  *
  * Injects:
  *   - the custom codegen expressions (`cosine_similarity`, `minhash_sig`,
  *     `simhash_sig`) as named SQL functions;
  *   - the text-signal family (`graft_token_count`, `graft_lang_id`,
  *     `graft_quality`, `graft_fingerprint`) — Column compositions lowered
  *     to expressions through the bridge, so `spark.sql` users get the
  *     exact same semantics as the Scala API;
  *   - [[graft.plans.ApproxSwapRule]], the conf-gated exact->sketch
  *     aggregate rewrite;
  *   - [[graft.plans.MvRewriteRule]], the conf-gated materialized-view
  *     auto-rewrite (`spark.graft.mvrewrite.enabled`, default off).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage)

  /** A literal argument that must fold at registration time (e.g.
    * minhash_sig's permutation count — it sizes codegen'd arrays). */
  private def literalInt(e: Expression, fn: String, arg: String): Int = {
    require(e.foldable, s"$fn: $arg must be a literal, got $e")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(array<double>, array<double>) - fused cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))

    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<long> hashes, int numPerm[, long seed]) - MinHash signature"),
      (exprs: Seq[Expression]) => {
        val numPerm = literalInt(exprs(1), "minhash_sig", "numPerm")
        val seed = if (exprs.length > 2) literalInt(exprs(2), "minhash_sig", "seed").toLong else 42L
        new MinHashSigExpr(exprs(0), numPerm, seed)
      }))

    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      info("simhash_sig", "simhash_sig(array<long> tokenHashes) - 64-bit SimHash"),
      (exprs: Seq[Expression]) => new SimHashSigExpr(exprs(0))))

    ext.injectFunction((
      FunctionIdentifier("canonical_text"),
      info("canonical_text", "canonical_text(text) - NFC + casefold + punctuation/whitespace canonical form"),
      (exprs: Seq[Expression]) => new graft.functions.CanonicalTextExpr(exprs.head)))

    ext.injectFunction((
      FunctionIdentifier("hamming_distance"),
      info("hamming_distance",
        "hamming_distance(string, string) - differing positions over the common prefix + length difference"),
      (exprs: Seq[Expression]) => graft.functions.HammingDistance(exprs(0), exprs(1))))

    ext.injectFunction((
      FunctionIdentifier("deflate_ratio"),
      info("deflate_ratio",
        "deflate_ratio(text) - deflate-compressed bytes / raw bytes (low = repetitive junk)"),
      (exprs: Seq[Expression]) => graft.functions.DeflateRatioExpr(exprs.head)))

    ext.injectFunction((
      FunctionIdentifier("interleave_bits"),
      info("interleave_bits", "interleave_bits(bigint x, bigint y) - Morton z-value of two non-negative keys"),
      (exprs: Seq[Expression]) => new InterleaveBits(exprs(0), exprs(1))))

    ext.injectFunction((
      FunctionIdentifier("interleave_bits_n"),
      info("interleave_bits_n", "interleave_bits_n(bigint...) - N-dim Morton z-value (floor(63/n) bits per key)"),
      (exprs: Seq[Expression]) => graft.functions.InterleaveBitsN(
        org.apache.spark.sql.catalyst.expressions.CreateArray(
          exprs.map(e => org.apache.spark.sql.catalyst.expressions.Cast(
            e, org.apache.spark.sql.types.LongType))),
        exprs.size)))

    // Column-composition functions: build the Column pipeline once per
    // call site and lower it to the underlying expression tree.
    def composed(name: String, usage: String)(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        info(name, usage),
        (exprs: Seq[Expression]) => bridge.lower(f(bridge.column(exprs.head)))))

    composed("graft_token_count", "graft_token_count(text) - whitespace token count")(TextFunctions.tokenCount)
    composed("graft_lang_id", "graft_lang_id(text) - marker-word language id")(TextFunctions.langId)
    composed("graft_quality", "graft_quality(text) - [0,1] quality score")(TextFunctions.qualityScore)
    composed("graft_fingerprint", "graft_fingerprint(text) - rolling polynomial hash")(TextFunctions.fingerprint)

    ext.injectOptimizerRule(_ => ApproxSwapRule)
    ext.injectOptimizerRule(_ => MvRewriteRule)
    ext.injectResolutionRule(_ => graft.sources.VtDmlRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // Maintenance SQL (DESCRIBE HISTORY / SHOW TAGS / VACUUM / OPTIMIZE /
    // ANALYZE / RESTORE / DESCRIBE DETAIL) for versioned tables;
    // everything else falls through to the default parser untouched.
    ext.injectParser((_, delegate) => new graft.sources.VtSqlParser(delegate))
    // Row-level change feed as a SQL table function:
    //   SELECT * FROM vt_changes('/path/tbl', fromVersion, toVersion)
    // Arguments must be literals (the plan is built at analysis time);
    // the result is changesWithType's frame — data columns plus
    // _change_type / _commit_version.
    ext.injectTableFunction((
      FunctionIdentifier("vt_changes"),
      info("vt_changes",
        "vt_changes(path, fromVersion, toVersion) - versioned-table row-level change feed"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"vt_changes(path, fromVersion, toVersion) takes 3 arguments, got ${args.length}")
        require(args.forall(_.foldable), "vt_changes arguments must be literals")
        val spark = org.apache.spark.sql.SparkSession.active
        val path = args.head.eval().toString
        // version boundaries may be numbers OR tag names, so a release
        // diff reads as vt_changes('/t', 'v1.0', 'v1.1')
        def versionOf(e: Expression, name: String): Long = e.dataType match {
          case _: org.apache.spark.sql.types.StringType =>
            graft.io.VersionedTable.tagVersion(
              spark, path, e.eval().toString)
          case _ => literalInt(e, "vt_changes", name).toLong
        }
        val from = versionOf(args(1), "fromVersion")
        val to = versionOf(args(2), "toVersion")
        graft.io.VersionedTable
          .changesWithType(spark, path, from, to)
          .queryExecution.analyzed
      }))
  }
}
