package graft.ingest

import scala.util.hashing.MurmurHash3

/** Deterministic CLK (Bloom-filter bitvector) encoder over text —
  * clkhash-style semantics (n-gram tokenization + k hash positions per
  * n-gram into an l-bit vector; shape per the reference's linking schema,
  * `benchmarking/schema/default-linking-schema.json:3-9`: l=1024 bits =
  * 128 bytes). The reference never encodes server-side (CLKs arrive
  * pre-encoded, `docs/concepts.rst:56-76`); this encoder exists so the
  * synthetic web-page corpus can be linked end-to-end. Byte-compat with
  * the clkhash wheel is NOT required (fixture CLKs are consumed as-is).
  *
  * Scheme (frozen):
  *  - normalize: lowercase, split on non-alphanumeric runs;
  *  - shingles: per token, pad " tok " and take character 2-grams;
  *  - per shingle: Kirsch-Mitzenmacher double hashing — k bit positions
  *    pos_i = (h1 + i*h2) mod l with h1/h2 = MurmurHash3(shingle, seed⊕c).
  */
object ClkEncoder {

  val DefaultBits = 1024
  // k chosen for ~25-50% fill on 20-40-token documents: ~150 bigram
  // shingles * 5 bits / 1024 bits. (clkhash computes k from expected
  // n-gram counts the same way; k=30 would saturate the filter and
  // destroy discrimination.)
  val DefaultK = 5
  val DefaultSeed = 0x5eed

  def tokens(text: String): Array[String] =
    text.toLowerCase.split("[^\\p{Alnum}]+").filter(_.nonEmpty)

  def shingles(text: String): Array[String] =
    tokens(text).flatMap { t =>
      val padded = " " + t + " "
      (0 until padded.length - 1).map(i => padded.substring(i, i + 2))
    }

  /** Encode text into an l-bit CLK (l/8 bytes, little-endian bit order
    * within each byte: bit b sets byte b>>3, mask 1<<(b&7)). */
  def encode(text: String, bits: Int = DefaultBits, k: Int = DefaultK,
      seed: Int = DefaultSeed): Array[Byte] = {
    require(bits % 8 == 0, s"bits must be a multiple of 8: $bits")
    val out = new Array[Byte](bits / 8)
    val sh = shingles(text)
    var si = 0
    while (si < sh.length) {
      val s = sh(si)
      val h1 = MurmurHash3.stringHash(s, seed)
      val h2 = MurmurHash3.stringHash(s, seed ^ 0x9e3779b9) | 1 // odd -> full cycle
      var i = 0
      while (i < k) {
        val pos = java.lang.Integer.remainderUnsigned(h1 + i * h2, bits)
        out(pos >>> 3) = (out(pos >>> 3) | (1 << (pos & 7))).toByte
        i += 1
      }
      si += 1
    }
    out
  }

  /** Distinct sorted bit positions [[encode]] would set — the oracle-replay
    * view of the same double-hashing scheme (the q_clk_encode aux dump: the
    * DuckDB oracle rebuilds the bitvector bytes, hex and popcount from these
    * positions, so the positions→bytes fold is value-checked; the hashing
    * itself is gated by ClkEncoderSpec's bits==positions equality). */
  def positionsDistinct(text: String, bits: Int = DefaultBits,
      k: Int = DefaultK, seed: Int = DefaultSeed): Array[Int] = {
    val set = scala.collection.mutable.SortedSet.empty[Int]
    val sh = shingles(text)
    var si = 0
    while (si < sh.length) {
      val s = sh(si)
      val h1 = MurmurHash3.stringHash(s, seed)
      val h2 = MurmurHash3.stringHash(s, seed ^ 0x9e3779b9) | 1
      var i = 0
      while (i < k) {
        set += java.lang.Integer.remainderUnsigned(h1 + i * h2, bits)
        i += 1
      }
      si += 1
    }
    set.toArray
  }

  /** The k bit positions one shingle sets (the per-shingle view of
    * [[encode]]'s double hashing) — the attacker-side primitive of
    * frequency-alignment cryptanalysis (a shingle's positions are what
    * the attack tries to recover from bit frequencies). */
  def shinglePositions(s: String, bits: Int = DefaultBits,
      k: Int = DefaultK, seed: Int = DefaultSeed): Array[Int] = {
    val h1 = MurmurHash3.stringHash(s, seed)
    val h2 = MurmurHash3.stringHash(s, seed ^ 0x9e3779b9) | 1
    Array.tabulate(k)(i =>
      java.lang.Integer.remainderUnsigned(h1 + i * h2, bits)).distinct
  }

  /** BLIP-style deterministic hardening flip mask (Alaggan et al. BLIP /
    * Schnell's Bloom-filter hardening family): bit b of record `id` flips
    * iff a keyed mix of (id, b, seed) lands in a 1-in-`rate` residue class.
    * Production BLIP uses true randomness; this engine freezes the mask to
    * a keyed hash so runs are reproducible and oracle-replayable (the mask
    * is dumped, the XOR fold is what the DuckDB oracle checks). Returns the
    * sorted positions to flip. */
  def blipFlips(id: Long, bits: Int = DefaultBits, rate: Int = 8,
      seed: Int = DefaultSeed): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var b = 0
    while (b < bits) {
      val h = MurmurHash3.productHash((id, b), seed)
      if (java.lang.Integer.remainderUnsigned(h, rate) == 0) out += b
      b += 1
    }
    out.toArray
  }

  /** XOR-folding hardening (Schnell & Borgs 2016, "XOR-folding for
    * Bloom-filter-based encryptions for PPRL"): fold the CLK in half by
    * XORing the upper half into the lower half, halving the length.
    * Folding is a many-to-one map, so bit-pattern attacks lose the
    * positional frequency signal, at the cost of some Dice fidelity
    * (each folded bit is the PARITY of two original bits). Deterministic
    * and keyless — the privacy comes from information destruction, not
    * secrecy — so it is fully oracle-replayable from the bit positions.
    * Requires an even byte length. */
  def foldXor(clk: Array[Byte]): Array[Byte] = {
    require(clk.length % 2 == 0, s"foldXor needs even length: ${clk.length}")
    val half = clk.length / 2
    val out = new Array[Byte](half)
    var i = 0
    while (i < half) {
      out(i) = (clk(i) ^ clk(i + half)).toByte
      i += 1
    }
    out
  }

  /** XOR the flip mask into a CLK (the BLIP hardening application). */
  def applyFlips(clk: Array[Byte], flips: Array[Int]): Array[Byte] = {
    val out = clk.clone()
    var i = 0
    while (i < flips.length) {
      val p = flips(i)
      out(p >>> 3) = (out(p >>> 3) ^ (1 << (p & 7))).toByte
      i += 1
    }
    out
  }
}
