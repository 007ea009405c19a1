package graft.core

import org.apache.spark.sql.catalyst.util.ArrayData

/** Sorted-set kernels over Catalyst ArrayData. The generic
  * `array_intersect` over UTF8String arrays builds a hash set per pair
  * and compares variable-length strings — measured ~1-3 ms per pair on
  * ~143-element trigram sets (the round-2 q_jaccard_char3 outlier:
  * 79% of the round's bench). Hashing each gram to a long ONCE per
  * document (`xxhash64` + `sort_array`) turns the per-pair confirm into
  * a branch-light long-merge scan: two monotone pointers, no
  * allocation, ~100x cheaper. */
object SetOps {

  /** Sorted distinct xxhash64 values of the character n-grams of a text —
    * the whole trigram-signature pipeline (substring explode → hash →
    * distinct → sort) in ONE pass over the UTF8String bytes, zero
    * substring allocation. Each gram is hashed in place over its byte
    * range (UTF-8 character boundaries honored, so the gram identity is
    * character-exact, matching a character-based `substr` oracle).
    * Texts shorter than n characters yield one gram = the whole text
    * (parity with Dedup.charNgrams). */
  def hashedCharNgrams(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    // character start offsets (relative), one extra terminal entry
    val numChars = s.numChars()
    val starts = new Array[Int](numChars + 1)
    var i = 0
    var b = 0
    while (b < nb) {
      starts(i) = b
      b += UTF8String.numBytesForFirstByte(org.apache.spark.unsafe.Platform.getByte(base, off + b))
      i += 1
    }
    starts(numChars) = nb
    val seed = 42L
    if (numChars < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off, nb, seed)))
    val m = numChars - n + 1
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        base, off + starts(i), starts(i + n) - starts(i), seed)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place unique
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (w == m) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** Shared-key min-sum of two string->long tf maps:
    * Σ_{k ∈ keys(a) ∩ keys(b)} min(a(k), b(k)) — the weighted-Jaccard
    * numerator. Bit-identical to the map_zip_with/aggregate tree it
    * replaces (keys only on one side contribute least(v, 0) = 0 because tf
    * counts are >= 1; map keys are unique), but as one codegen'd call
    * instead of interpreted HOF lambdas. O(|a|·|b|) byte-equality scans —
    * tf maps are per-document distinct-token sized, so the quadratic term
    * is bounded by document length, never corpus size. */
  def tfMinSumShared(a: org.apache.spark.sql.catalyst.util.MapData,
      b: org.apache.spark.sql.catalyst.util.MapData): Long = {
    val ka = a.keyArray(); val va = a.valueArray()
    val kb = b.keyArray(); val vb = b.valueArray()
    val na = ka.numElements(); val nb = kb.numElements()
    var sum = 0L
    var i = 0
    while (i < na) {
      val key = ka.getUTF8String(i)
      var j = 0
      var found = false
      while (j < nb && !found) {
        if (key.equals(kb.getUTF8String(j))) {
          val x = va.getLong(i); val y = vb.getLong(j)
          sum += (if (x < y) x else y)
          found = true
        }
        j += 1
      }
      i += 1
    }
    sum
  }

  /** Intersection size of two ascending-sorted long arrays (merge scan).
    * Inputs must be sorted and duplicate-free (sort_array ∘ array_distinct
    * guarantees both). */
  def intersectCountSortedLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}
