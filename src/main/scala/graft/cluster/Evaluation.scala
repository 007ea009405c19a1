package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-level linkage evaluation. [[graft.link.Pipeline.pairwiseF1]]
  * scores the EDGE set; the standard complement for entity resolution is
  * B-cubed (Bagga & Baldwin 1998) — the per-RECORD precision/recall of
  * the clustering itself, which unlike pairwise F1 neither lets one
  * mega-cluster dominate the score quadratically nor ignores singletons.
  *
  * For record i with predicted cluster C(i) and truth entity E(i):
  *   P_i = |C(i) ∩ E(i)| / |C(i)|,  R_i = |C(i) ∩ E(i)| / |E(i)|
  * and B³ precision/recall are the means over all records. Grouping by
  * the (cluster, entity) intersection cell, that mean is
  *   P = Σ_{c,e} n_ce² / n_c / N  (recall symmetric with n_e).
  *
  * Determinism: each cell's term is computed in FIXED-POINT integer
  * arithmetic — (n_ce² · scale) DIV n_c — and summed as longs, so the
  * result is bit-identical at any partitioning and replayable in any
  * engine with integer division (the [[PageRank]] discipline; floating
  * sums commute per shuffle order and never hash-compare stably). Only
  * the final 3 ratios are doubles, each a single division of two
  * deterministic scalars.
  *
  * Bounds: a cell term overflows long when n_ce² · scale ≥ 2⁶³ — with
  * the default scale 10⁹ that is n_ce ≈ 3·10⁶ members sharing one
  * (cluster, entity) cell; pass a smaller scale for labeled sets beyond
  * that.
  *
  * Scale shape: three hash aggs over bare ids + two equi-joins on the
  * cell table (dimension-sized — one row per non-empty intersection)
  * and a single global fold. No collects, no windows.
  */
object Evaluation {

  /** @param assign one row per record: (predCol, truthCol) cluster /
    *               entity labels. Singletons must be present with
    *               unique labels (they count for both P and R).
    * @return one row: (n, p_num, r_num, b3_precision, b3_recall, b3_f1)
    *         where p_num/r_num are the exact fixed-point sums. */
  def bcubed(assign: DataFrame, predCol: String, truthCol: String,
      scale: Long = 1000000000L): DataFrame = {
    require(scale >= 1000L, "scale below 1e3 loses all precision")
    val a = assign.select(col(predCol).as("c"), col(truthCol).as("e"))
    val nce = a.groupBy("c", "e").agg(count(lit(1)).as("n_ce"))
    val nc = a.groupBy("c").agg(count(lit(1)).as("n_c"))
    val ne = a.groupBy("e").agg(count(lit(1)).as("n_e"))
    val cells = nce.join(nc, "c").join(ne, "e")
    val sums = cells.agg(
      sum(col("n_ce")).as("n"),
      sum(expr(s"(n_ce * n_ce * ${scale}L) DIV n_c")).as("p_num"),
      sum(expr(s"(n_ce * n_ce * ${scale}L) DIV n_e")).as("r_num"))
    val p = col("p_num").cast("double") / (lit(scale) * col("n"))
    val r = col("r_num").cast("double") / (lit(scale) * col("n"))
    sums.select(col("n"), col("p_num"), col("r_num"),
      p.as("b3_precision"), r.as("b3_recall"),
      (lit(2.0) * p * r / (p + r)).as("b3_f1"))
  }
}
