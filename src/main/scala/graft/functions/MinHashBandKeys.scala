package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Fully-fused MinHash→LSH band keys: from an `array<string>` of shingles,
  * computes the whole signature/banding chain in ONE compiled pass —
  * per-shingle xxhash64 base hash, all `numPerm` universal-family minima,
  * then one 64-bit key per band — allocating only the final `bands`-long
  * output array.
  *
  * Bit-identical to the composed column chain it replaces
  * (`shingleHashes` → `MinHashSigExpr` → `bandKeys` in
  * [[graft.ops.Dedup]]), which paid interpreted higher-order-lambda
  * dispatch per shingle on the way in (base hashing) and per band on the
  * way out (slice + array hash). Equivalence is locked by reusing Spark's
  * own `XXH64` kernels with the same seeds Spark's `xxhash64` uses:
  *
  *  - base: `XXH64.hashUTF8String(shingle, 42)` (what `xxhash64(col)` does
  *    for a string child),
  *  - signature: `(a_i * (base & 2^31-1) + b_i) mod 2^31-1` with
  *    [[MinHashSigExpr.coefficients]],
  *  - band key b: fold `hashLong` over the band's `rowsPerBand` signature
  *    values starting from seed 42, then `hashInt(b)` — exactly
  *    `xxhash64(slice(sig, b*r+1, r), b)` on an `array<bigint>`.
  */
case class MinHashBandKeysExpr(child: Expression, numPerm: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  require(bands > 0 && numPerm % bands == 0,
    s"numPerm ($numPerm) must be a positive multiple of bands ($bands)")
  private val rowsPerBand = numPerm / bands

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys needs array<string> input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  @transient private lazy val (as: Array[Long], bs: Array[Long]) =
    MinHashSigExpr.coefficients(numPerm, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = XXH64.hashUTF8String(arr.getUTF8String(j), 42L) & 0x7FFFFFFFL
      var i = 0
      while (i < numPerm) {
        val v = (x * as(i) + bs(i)) % 2147483647L
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var k = b * rowsPerBand
      val end = k + rowsPerBand
      while (k < end) { h = XXH64.hashLong(mins(k), h); k += 1 }
      keys(b) = XXH64.hashInt(b, h)
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val end = ctx.freshName("end")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      val keys = ctx.freshName("keys")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$numPerm];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $x = $xxh.hashUTF8String($c.getUTF8String($j), 42L) & 0x7FFFFFFFL;
         |  for (int $i = 0; $i < $numPerm; $i++) {
         |    long $v = ($x * $asRef[$i] + $bsRef[$i]) % 2147483647L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = 42L;
         |  int $k = $b * $rowsPerBand;
         |  int $end = $k + $rowsPerBand;
         |  for (; $k < $end; $k++) { $h = $xxh.hashLong($mins[$k], $h); }
         |  $keys[$b] = $xxh.hashInt($b, $h);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeysExpr =
    copy(child = newChild)
}

object MinHashBandKeysExpr {
  def apply(shingles: Column, numPerm: Int, bands: Int, seed: Long = 42L): Column =
    bridge.column(new MinHashBandKeysExpr(bridge.expression(shingles), numPerm, bands, seed))
}

/** Distinct shingle-hash set: from an `array<string>` of tokens, emits the
  * xxhash64 of every n-token shingle (space-joined, exactly
  * `xxhash64(concat_ws(' ', slice(toks, i+1, n)))`), first-occurrence
  * deduplicated — i.e. `transform`+`array_distinct` of
  * [[graft.functions.TextFunctions.shingles]] composed with per-element
  * `xxhash64`, as one compiled loop that never materializes a shingle
  * string column.
  *
  * Downstream set algebra (MinHash banding, Jaccard intersect/union) runs
  * on fixed-width longs instead of arbitrary-length strings: ~2-5x less
  * shuffle volume and branch-free comparisons, identical results modulo
  * 64-bit hash collisions (~n²/2⁶⁴ per doc — negligible at any corpus
  * size).
  */
case class ShingleHashSetExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set needs array<string> input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(ShingleHashSetExpr.hashSet(arr, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Calls the companion's static forwarder on the case class — NOT
    // `ShingleHashSetExpr.MODULE$`, which Janino rejects (the MODULE$ field
    // lives on the `ShingleHashSetExpr$` module class, and the failed
    // compile silently degraded every task to interpreted eval).
    val helper = classOf[ShingleHashSetExpr].getName
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $helper.hashSet($c, $n));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSetExpr =
    copy(child = newChild)
}

object ShingleHashSetExpr {
  import org.apache.spark.unsafe.types.UTF8String

  private val Space = UTF8String.fromString(" ")

  /** Shared eval/codegen kernel (codegen calls it as a referenced module —
    * the win here is skipping the string column + interpreted lambdas, not
    * inlining the loop). First-occurrence order, like `array_distinct`. */
  def hashSet(toks: ArrayData, n: Int): Array[Long] = {
    val total = toks.numElements()
    val windows = total - n + 1
    if (windows <= 0) return Array.emptyLongArray
    val seen = new java.util.HashSet[java.lang.Long](windows * 2)
    val out = new Array[Long](windows)
    val parts = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < windows) {
      var k = 0
      while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
      val h = XXH64.hashUTF8String(UTF8String.concatWs(Space, parts: _*), 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    if (m == windows) out else java.util.Arrays.copyOf(out, m)
  }

  def apply(toks: Column, n: Int): Column =
    bridge.column(new ShingleHashSetExpr(bridge.expression(toks), n))
}

/** Band keys from precomputed shingle hashes (`array<bigint>`): the
  * signature + banding half of [[MinHashBandKeysExpr]], for pipelines that
  * materialize the hash set once ([[ShingleHashSetExpr]]) and reuse it for
  * both banding and Jaccard verification. Bit-identical band keys to
  * [[MinHashBandKeysExpr]] on the same shingles. */
case class MinHashBandKeysFromHashesExpr(
    child: Expression, numPerm: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  require(bands > 0 && numPerm % bands == 0,
    s"numPerm ($numPerm) must be a positive multiple of bands ($bands)")
  private val rowsPerBand = numPerm / bands

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys_from_hashes needs array<bigint> input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "minhash_band_keys_from_hashes"

  @transient private lazy val (as: Array[Long], bs: Array[Long]) =
    MinHashSigExpr.coefficients(numPerm, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = arr.getLong(j) & 0x7FFFFFFFL
      var i = 0
      while (i < numPerm) {
        val v = (x * as(i) + bs(i)) % 2147483647L
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var k = b * rowsPerBand
      val end = k + rowsPerBand
      while (k < end) { h = XXH64.hashLong(mins(k), h); k += 1 }
      keys(b) = XXH64.hashInt(b, h)
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val end = ctx.freshName("end")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      val keys = ctx.freshName("keys")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$numPerm];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $x = $c.getLong($j) & 0x7FFFFFFFL;
         |  for (int $i = 0; $i < $numPerm; $i++) {
         |    long $v = ($x * $asRef[$i] + $bsRef[$i]) % 2147483647L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = 42L;
         |  int $k = $b * $rowsPerBand;
         |  int $end = $k + $rowsPerBand;
         |  for (; $k < $end; $k++) { $h = $xxh.hashLong($mins[$k], $h); }
         |  $keys[$b] = $xxh.hashInt($b, $h);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandKeysFromHashesExpr =
    copy(child = newChild)
}

object MinHashBandKeysFromHashesExpr {
  def apply(hashes: Column, numPerm: Int, bands: Int, seed: Long = 42L): Column =
    bridge.column(
      new MinHashBandKeysFromHashesExpr(bridge.expression(hashes), numPerm, bands, seed))
}
