package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.FileBloom

class FileBloomSpec extends AnyFunSuite {

  test("no false negatives, ever") {
    val keys = (0 until 50000).map(i => i.toLong * 7919L - 1000L)
    val (m, bytes) = FileBloom.build(keys.iterator, keys.size)
    keys.foreach(k => assert(FileBloom.mightContain(m, bytes, k), s"lost key $k"))
  }

  test("false-positive rate stays near the 12-bits/key design point") {
    val keys = (0 until 20000).map(_.toLong * 3L) // multiples of 3
    val (m, bytes) = FileBloom.build(keys.iterator, keys.size)
    val probes = (0 until 20000).map(_.toLong * 3L + 1L) // never inserted
    val fp = probes.count(FileBloom.mightContain(m, bytes, _))
    // design FPR ~0.3%; allow 4x slack for hash variance
    assert(fp <= probes.size * 0.012, s"$fp false positives of ${probes.size}")
  }

  test("tiny and adversarial inputs: empty, single key, duplicate keys") {
    val (m0, b0) = FileBloom.build(Iterator.empty, 0)
    assert(m0 >= 1024 && !FileBloom.mightContain(m0, b0, 42L))
    val (m1, b1) = FileBloom.build(Iterator(Long.MinValue, Long.MinValue, 0L), 3)
    assert(FileBloom.mightContain(m1, b1, Long.MinValue))
    assert(FileBloom.mightContain(m1, b1, 0L))
  }
}
