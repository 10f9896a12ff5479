package graft.io

/** Per-FILE Bloom filters over long-castable key columns, stored as
  * manifest-referenced sidecar parquet ("puffin-style": Iceberg keeps
  * the same structure in .puffin files, Delta in per-file bloom
  * sidecars). They answer the question min/max ranges cannot: "can file
  * F contain KEY k?" on a column whose values are SCATTERED across
  * files — after enough appends every file's [min,max] spans the whole
  * domain and range skipping keeps everything, but a per-file bloom
  * still prunes point probes to the files that actually hold the key
  * (mod the false-positive rate, which only costs extra reads, never
  * wrong results).
  *
  * At 100 TB this is the CDC lever: a merge/delete keyed by a
  * high-cardinality id on an unclustered table would otherwise
  * candidate-match every file; blooms bound the rewrite set by the
  * batch's true footprint. Sizing: ~12 bits/key, 7 probes → ~0.3% FPR;
  * a 1M-row file costs ~1.5 MB of sidecar, ~0.1% of its data size.
  *
  * Hashing is double-hashed splitmix64 (public-domain finalizer,
  * Steele et al., OOPSLA'14) computed IN SCALA on both the build and
  * probe sides, so the two can never drift. */
object FileBloom {
  val BitsPerKey = 12
  val NumHashes = 7

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def probes(key: Long, m: Int): Array[Int] = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5DEECE66DL) | 1L // odd => full period mod 2^64
    val out = new Array[Int](NumHashes)
    var j = 0
    while (j < NumHashes) {
      out(j) = java.lang.Long.remainderUnsigned(h1 + j.toLong * h2, m.toLong).toInt
      j += 1
    }
    out
  }

  /** Build one filter over a file's keys. Returns (m bits, packed bytes). */
  def build(keys: Iterator[Long], nHint: Int): (Int, Array[Byte]) = {
    val buf = new scala.collection.mutable.ArrayBuffer[Long](math.max(16, nHint))
    keys.foreach(buf += _)
    val m = math.max(1024, BitsPerKey * buf.length)
    val bytes = new Array[Byte]((m + 7) / 8)
    var i = 0
    while (i < buf.length) {
      val ps = probes(buf(i), m)
      var j = 0
      while (j < NumHashes) {
        val b = ps(j)
        bytes(b >>> 3) = (bytes(b >>> 3) | (1 << (b & 7)).toByte).toByte
        j += 1
      }
      i += 1
    }
    (m, bytes)
  }

  /** Set one key's bits in an EXISTING m-bit array — the distributed
    * build path ([[graft.ops.BloomJoin]]) OR-merges fixed-size partials,
    * so it adds keys one at a time instead of going through [[build]]'s
    * size-from-content sizing. */
  def add(m: Int, bytes: Array[Byte], key: Long): Unit = {
    val ps = probes(key, m)
    var j = 0
    while (j < NumHashes) {
      val b = ps(j)
      bytes(b >>> 3) = (bytes(b >>> 3) | (1 << (b & 7)).toByte).toByte
      j += 1
    }
  }

  /** Probe side: false means DEFINITELY absent; true means maybe. */
  def mightContain(m: Int, bytes: Array[Byte], key: Long): Boolean = {
    val ps = probes(key, m)
    var j = 0
    while (j < NumHashes) {
      val b = ps(j)
      if ((bytes(b >>> 3) & (1 << (b & 7))) == 0) return false
      j += 1
    }
    true
  }
}
