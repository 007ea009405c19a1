package graft.link

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ClusterMember, Edge, LinkConfig, Record}
import graft.cluster.Solver

/** End-to-end linkage runs — the Spark equivalent of the reference's
  * `POST /runs` lifecycle (`backend/entityservice/tasks/comparing.py:44-99`
  * → `tasks/solver.py` → groups), traced in SURVEY.md §3.2.
  */
object Pipeline {

  /** Attach the default single block "1" (no-blocking case,
    * `encoding_storage.py:21`) and normalize to the linkage schema
    * (dp, entity_id, clk, popcount, block_key). */
  def defaultBlock(records: Dataset[Record]): DataFrame =
    records.toDF("dp", "entity_id", "clk", "popcount")
      .withColumn("block_key", lit("1"))

  /** records (+ blocks) -> scored, deduped edges. */
  def edges(blocked: DataFrame, cfg: LinkConfig): Dataset[Edge] =
    Linker.scoreCandidates(blocked, cfg)

  /** records (+ blocks) -> entity clusters. */
  def clusters(blocked: DataFrame, cfg: LinkConfig): Dataset[ClusterMember] =
    Solver.solve(edges(blocked, cfg), cfg)

  /** Pairwise F1 of cluster-implied cross-provider pairs vs a truth set of
    * (rec0, rec1) pairs for providers (0,1) — the fixture gate
    * (reference oracle pattern: `e2etests/tests/test_results_correctness.py`).
    */
  def pairwiseF1(clusters: Dataset[ClusterMember], truth: DataFrame): Double = {
    val spark = clusters.sparkSession
    import spark.implicits._
    val pred = Solver.pairsFromClusters(clusters)
      .where($"dp0" === 0 && $"dp1" === 1)
      .select($"rec0", $"rec1")
    val t = truth.select($"rec0".cast("long"), $"rec1".cast("long"))
    val nPred = pred.count().toDouble
    val nTrue = t.count().toDouble
    val tp = pred.join(t, Seq("rec0", "rec1"), "left_semi").count().toDouble
    if (nPred == 0 || nTrue == 0 || tp == 0) 0.0
    else {
      val p = tp / nPred
      val r = tp / nTrue
      2 * p * r / (p + r)
    }
  }
}
