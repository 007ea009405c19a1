package graft

import graft.core.BitOps
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class BitOpsSpec extends AnyFunSuite {

  private def randBytes(rnd: Random, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  test("popcount known vectors") {
    assert(BitOps.popcount(Array[Byte]()) == 0)
    assert(BitOps.popcount(Array.fill[Byte](16)(0)) == 0)
    assert(BitOps.popcount(Array.fill[Byte](16)(-1)) == 128)
    assert(BitOps.popcount(Array[Byte](1, 2, 4, 8, 16, 32, 64, -128, 3)) == 10)
  }

  test("popcount matches per-byte reference on random inputs incl. tails") {
    val rnd = new Random(42)
    for (_ <- 1 to 500) {
      val a = randBytes(rnd, rnd.nextInt(160)) // exercises 8-byte stride + tail
      val expected = a.map(b => Integer.bitCount(b & 0xff)).sum
      assert(BitOps.popcount(a) == expected)
    }
  }

  test("andPopcount matches per-byte reference") {
    val rnd = new Random(43)
    for (_ <- 1 to 500) {
      val a = randBytes(rnd, rnd.nextInt(160))
      val b = randBytes(rnd, rnd.nextInt(160))
      val n = math.min(a.length, b.length)
      val expected = (0 until n).map(i => Integer.bitCount((a(i) & b(i)) & 0xff)).sum
      assert(BitOps.andPopcount(a, b) == expected)
    }
  }

  test("dice bounds, symmetry, identity") {
    val rnd = new Random(44)
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(128) + 1
      val a = randBytes(rnd, n)
      val b = randBytes(rnd, n)
      if (BitOps.popcount(a) > 0) assert(BitOps.dice(a, a) == 1.0)
      val d = BitOps.dice(a, b)
      assert(d >= 0.0 && d <= 1.0)
      assert(d == BitOps.dice(b, a))
    }
    assert(BitOps.dice(Array.fill[Byte](8)(0), Array.fill[Byte](8)(0)) == 0.0)
  }

  test("dice disjoint vectors = 0") {
    val a = Array[Byte](0x0f, 0x0f, 0x0f, 0x0f, 0, 0, 0, 0)
    val b = Array[Byte](0xf0.toByte, 0xf0.toByte, 0xf0.toByte, 0xf0.toByte, 0, 0, 0, 0)
    assert(BitOps.dice(a, b) == 0.0)
  }

  test("dicePre consistent with dice") {
    val rnd = new Random(45)
    for (_ <- 1 to 300) {
      val n = (rnd.nextInt(16) + 1) * 8
      val a = randBytes(rnd, n)
      val b = randBytes(rnd, n)
      val pcs = BitOps.popcount(a) + BitOps.popcount(b)
      assert(BitOps.dicePre(a, b, pcs) == BitOps.dice(a, b))
    }
  }

  test("BloomOps: zero false negatives; FP rate near the 10-bits/key theory") {
    import graft.core.BloomOps
    val n = 10000; val bpk = 10
    val m = ((n.toLong * bpk + 63) / 64) * 64
    val k = math.round(bpk * math.log(2)).toInt
    val bits = new Array[Long]((m / 64).toInt)
    val rnd = new Random(42)
    val members = Array.fill(n)(rnd.nextLong())
    members.foreach { h =>
      val ps = BloomOps.positions(h, k, m)
      (0 until k).foreach { i =>
        val p = ps.getLong(i)
        assert(p >= 0 && p < m, s"position $p out of [0,$m)")
        bits((p >>> 6).toInt) |= 1L << (p & 63L).toInt
      }
    }
    // one-sided error: every inserted key must probe true
    assert(members.forall(BloomOps.mightContain(_, bits, k, m)))
    // FP rate on fresh randoms ~ (1-e^(-k n/m))^k ≈ 0.8%; allow 3x slack
    val probes = 100000
    val fps = (1 to probes).count(_ => BloomOps.mightContain(rnd.nextLong(), bits, k, m))
    assert(fps < probes * 3 / 100, s"false-positive rate too high: $fps/$probes")
    assert(fps > 0, "suspiciously perfect — filter likely broken")
  }
}
