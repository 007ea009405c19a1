package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link prediction over an undirected graph via the Resource Allocation
  * index (Zhou, Lü & Zhang 2009): for a non-adjacent pair (x, y),
  * RA(x,y) = Σ_{z ∈ N(x)∩N(y)} 1/deg(z) — Adamic–Adar's 1/log(deg)
  * replaced by 1/deg, which (a) empirically ranks as well or better and
  * (b) is exactly representable in fixed point (`scale DIV deg`, floored
  * — log is not bit-stable across engines). The linkage use: candidate
  * pairs the blocking missed — two records sharing several low-degree
  * co-occurrence neighbors are worth scoring even if no block key
  * matched.
  *
  * Scale shape: wedges are built by a self-join of the symmetric edge
  * list on the PIVOT z, which is quadratic in deg(z) — so pivots above
  * `maxPivotDeg` are dropped up front. That is both the skew guard (the
  * hot hub never explodes) and a principled truncation: a pivot of
  * degree d contributes only scale/d per wedge, so the dropped terms are
  * the asymptotically negligible ones (each < scale/maxPivotDeg).
  * Deterministic top-k (score desc, then ids) keeps the output bounded —
  * TakeOrderedAndProject, never a global sort.
  */
object LinkPredict {

  /** @param edges undirected (src, dst) in any orientation; dups and
    *              self-loops dropped.
    * @return top-k (x, y, ra_score) over NON-adjacent pairs, ra_score =
    *         Σ scale DIV deg(z), ordered by (score desc, x, y). */
  def resourceAllocation(edges: DataFrame, scale: Long = 1000000L,
      maxPivotDeg: Long = 64L, topK: Int = 50): DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sym = und.select(col("u").as("z"), col("v").as("n"))
      .union(und.select(col("v").as("z"), col("u").as("n")))
    val deg = sym.groupBy("z").agg(count(lit(1)).as("deg"))
    val pivotN = sym.join(deg.where(col("deg") <= maxPivotDeg), "z")
      .withColumn("w", expr(s"${scale}L DIV deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = pivotN.select(col("z"), col("n").as("x"), col("w"))
      .join(pivotN.select(col("z"), col("n").as("y")), "z")
      .where(col("x") < col("y"))
    val scores = wedges.groupBy("x", "y").agg(sum(col("w")).as("ra_score"))
    scores
      .join(und.select(col("u").as("x"), col("v").as("y")),
        Seq("x", "y"), "left_anti")
      .orderBy(col("ra_score").desc, col("x"), col("y"))
      .limit(topK)
  }
}
