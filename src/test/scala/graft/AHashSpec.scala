package graft

import graft.ops.Multimodal

/** Perceptual average-hash ([[Multimodal.averageHashBits]]): bit
  * semantics against an independent recomputation, the strict-threshold
  * edge, and rejection of non-raster input. */
class AHashSpec extends SparkSuite {

  /** Independent reference: recompute from the closed-form pixel function
    * (same formulas the q190 DuckDB oracle uses). */
  private def reference(w: Int, h: Int): String = {
    val gs = (0 until 64).map { i =>
      val sx = (i % 8) * w / 8
      val sy = (i / 8) * h / 8
      (sx * 7 + sy * 13) % 256 + (sx * 31 + sy) % 256 + (sx + sy * 57) % 256
    }
    val total = gs.map(_.toLong).sum
    gs.map(g => if (g * 64L > total) '1' else '0').mkString
  }

  test("hash bits match the closed-form reference across raster shapes") {
    for (w <- Seq(1, 3, 8, 16, 500); h <- Seq(1, 2, 8, 384)) {
      val got = Multimodal.averageHashBits(Multimodal.toBmpRaster(w, h))
      assert(got.contains(reference(w, h)), s"($w x $h)")
    }
  }

  test("a constant image hashes to all zeros (strict > at the mean)") {
    // 1x1 raster upsamples to 64 identical cells: g*64 == total everywhere
    val got = Multimodal.averageHashBits(Multimodal.toBmpRaster(1, 1)).get
    assert(got == "0" * 64)
  }

  test("hash has both bit values on a gradient image") {
    val got = Multimodal.averageHashBits(Multimodal.toBmpRaster(64, 64)).get
    assert(got.contains('0') && got.contains('1'))
  }

  test("non-raster bytes are rejected, not mis-hashed") {
    assert(Multimodal.averageHashBits(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.averageHashBits(Multimodal.toPng(Array[Byte](1, 2))).isEmpty)
  }
}
