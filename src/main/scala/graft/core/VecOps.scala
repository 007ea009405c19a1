package graft.core

import org.apache.spark.sql.catalyst.util.ArrayData

/** Dense-vector kernels over Catalyst ArrayData (no intermediate array
  * allocation — the `zip_with`+`aggregate` formulation allocates a zipped
  * array per pair, measured ~15x slower on all-pairs cosine jobs).
  * Left-to-right summation order (bit-compatible with a sequential
  * oracle). */
object VecOps {

  /** Dot product over the common prefix of two double arrays. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** L2 norm. */
  def norm2(a: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    math.sqrt(acc)
  }
}
