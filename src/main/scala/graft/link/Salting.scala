package graft.link

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Two-level salt fan-out math, shared by the linkage chunker
  * (graft.link.Linker) and the generic dedup pair generator
  * (graft.dedup.Dedup.saltedSelfPairs).
  *
  * A block/bucket of n rows needs fan-out needK = ceil(n / sqrt(aim)) so
  * that one chunk pair carries at most ~aim comparisons. A single salt
  * digit was previously capped at 4096 — a 10^9-row block needs
  * needK ~ 62500, so the cap silently under-split and one task carried
  * ~250x the aim. The fan-out is now COMPOSITE: two digits
  * (k1 = min(needK, maxK), k2 = ceil(needK / k1), each <= maxK,
  * effective k = k1*k2 >= needK up to maxK^2 = 16.7M ~ 10^13-row blocks),
  * materialized as two chained explodes so no row ever builds a
  * sequence array longer than maxK. k2 = 1 for every block below the
  * old cap — the normal path is unchanged.
  */
object Salting {

  /** (k1, k2) fan-out columns from a bucket-size column `n`. */
  def fanout(n: Column, aim: Long, maxK: Int): (Column, Column) = {
    val needK = greatest(ceil(n.cast("double") / math.sqrt(aim.toDouble)), lit(1L))
    val k1 = least(needK, lit(maxK.toLong)).cast("int")
    val k2 = least(ceil(needK.cast("double") / k1), lit(maxK.toLong)).cast("int")
    (k1, k2)
  }

  /** [[fanout]] with the aim as a COLUMN: lets a pair generator derive
    * the aim from job-size statistics inside the plan (scalar-broadcast
    * total) instead of a driver action — identical arithmetic (IEEE sqrt
    * / ceil match the scalar path) when the column is a literal. */
  def fanoutCol(n: Column, aim: Column, maxK: Int): (Column, Column) = {
    val needK = greatest(ceil(n.cast("double") / sqrt(aim.cast("double"))),
      lit(1L))
    val k1 = least(needK, lit(maxK.toLong)).cast("int")
    val k2 = least(ceil(needK.cast("double") / k1), lit(maxK.toLong)).cast("int")
    (k1, k2)
  }

  /** Scala mirror of [[fanout]] for property tests. */
  def fanoutScala(n: Long, aim: Long, maxK: Int): (Int, Int) = {
    val needK = math.max(math.ceil(n / math.sqrt(aim.toDouble)).toLong, 1L)
    val k1 = math.min(needK, maxK.toLong).toInt
    val k2 = math.min(math.ceil(needK.toDouble / k1).toLong, maxK.toLong).toInt
    (k1, k2)
  }
}
