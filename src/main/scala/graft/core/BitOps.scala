package graft.core

import org.apache.spark.unsafe.Platform

/** Bit-parallel kernels over fixed-width bitvector encodings (CLKs).
  *
  * Reference semantics: anonlink's Dice kernel, called at
  * `backend/entityservice/tasks/comparing.py:340-343` of
  * data61/anonlink-entity-service —
  * `sim = 2 * popcount(a & b) / (popcount(a) + popcount(b))`.
  * Encodings are 8..1024 bytes, always a multiple of 8
  * (`tasks/pre_run_check.py:77-78`), so the hot loop strides 8 bytes at a
  * time through `Platform.getLong` and `java.lang.Long.bitCount` (JIT emits
  * POPCNT). A byte-tail loop keeps the functions total for any length.
  *
  * These are plain static-forwardable methods so generated (whole-stage
  * codegen) Java can call them directly: `graft.core.BitOps.andPopcount(a,b)`.
  */
object BitOps {

  /** Number of set bits in the byte array. */
  def popcount(a: Array[Byte]): Int = {
    var i = 0
    var acc = 0
    val n8 = a.length - (a.length & 7)
    while (i < n8) {
      acc += java.lang.Long.bitCount(Platform.getLong(a, Platform.BYTE_ARRAY_OFFSET + i))
      i += 8
    }
    while (i < a.length) {
      acc += java.lang.Integer.bitCount(a(i) & 0xff)
      i += 1
    }
    acc
  }

  /** popcount(a & b) over the common prefix length. Lengths must match for
    * meaningful similarity; mismatched lengths score over min length. */
  def andPopcount(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    var acc = 0
    val n8 = n - (n & 7)
    while (i < n8) {
      val x = Platform.getLong(a, Platform.BYTE_ARRAY_OFFSET + i) &
        Platform.getLong(b, Platform.BYTE_ARRAY_OFFSET + i)
      acc += java.lang.Long.bitCount(x)
      i += 8
    }
    while (i < n) {
      acc += java.lang.Integer.bitCount((a(i) & b(i)) & 0xff)
      i += 1
    }
    acc
  }

  /** Sørensen–Dice coefficient; 0.0 when both vectors are empty (guard —
    * the reference kernel never emits such pairs above threshold anyway). */
  def dice(a: Array[Byte], b: Array[Byte]): Double = {
    val denom = popcount(a) + popcount(b)
    if (denom == 0) 0.0 else 2.0 * andPopcount(a, b) / denom
  }

  /** Dice with the popcount sum precomputed (the hot-join path carries
    * per-record popcounts, mirroring the reference's popcount cache at
    * `cache/encodings.py:42-45`). */
  def dicePre(a: Array[Byte], b: Array[Byte], pcSum: Int): Double =
    if (pcSum <= 0) 0.0 else 2.0 * andPopcount(a, b) / pcSum

  /** popcount(a[aOff..aOff+len) & b[bOff..bOff+len)) over contiguous
    * packed buffers — the chunk kernel stores a whole chunk in ONE byte
    * array so the inner loop streams L2-resident memory instead of
    * chasing per-record object pointers (that indirection made the naive
    * kernel DRAM-bound and killed multi-core scaling). len must be a
    * multiple of 8 (enforced at ingest, `pre_run_check.py:77-78`). */
  def andPopcountOff(a: Array[Byte], aOff: Int, b: Array[Byte], bOff: Int,
      len: Int): Int = {
    var i = 0
    var acc = 0
    val baseA = Platform.BYTE_ARRAY_OFFSET + aOff
    val baseB = Platform.BYTE_ARRAY_OFFSET + bOff
    while (i < len) {
      acc += java.lang.Long.bitCount(
        Platform.getLong(a, baseA + i) & Platform.getLong(b, baseB + i))
      i += 8
    }
    acc
  }

  /** Offset-buffer Dice with precomputed popcount sum. */
  def dicePreOff(a: Array[Byte], aOff: Int, b: Array[Byte], bOff: Int,
      len: Int, pcSum: Int): Double =
    if (pcSum <= 0) 0.0
    else 2.0 * andPopcountOff(a, aOff, b, bOff, len) / pcSum

  /** Spread the low 8 bits of v to the even bit positions (0,2,...,14)
    * — the magic-number Morton step. */
  @inline private def spread8(v: Int): Int = {
    var x = v & 0xff
    x = (x | (x << 4)) & 0x0f0f
    x = (x | (x << 2)) & 0x3333
    (x | (x << 1)) & 0x5555
  }

  /** 16-bit Morton (Z-order) code interleaving the low 8 bits of x and y;
    * x occupies the ODD bit positions (more significant within each
    * pair), y the even ones. The oracle replays this with the transparent
    * per-bit sum formula — two independent constructions agreeing. */
  def morton16(x: Int, y: Int): Int = (spread8(x) << 1) | spread8(y)

  /** Hamming bit-sampling LSH band keys from a packed long-word encoding:
    * band b's key packs the sampled bits positions(b*r .. b*r+r-1) into
    * the low r bits (bit i of the key = encoding bit positions(b*r+i)).
    * One tight loop, called from generated code — the array-expression
    * formulation of the same keys (768 unrolled shift/and terms) blows
    * janino's 64KB method limit and drops the whole stage to interpreted
    * eval. */
  def hammingLshKeys(words: org.apache.spark.sql.catalyst.util.ArrayData,
      positions: Array[Int], bitsPerBand: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val bands = positions.length / bitsPerBand
    val out = new Array[Long](bands)
    var b = 0
    var j = 0
    while (b < bands) {
      var key = 0L
      var i = 0
      while (i < bitsPerBand) {
        val p = positions(j)
        key |= ((words.getLong(p >>> 6) >>> (p & 63)) & 1L) << i
        i += 1
        j += 1
      }
      out(b) = key
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
