package graft.cluster

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over the candidate-edge graph via the
  * alternating large-star / small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * scale-out replacement for the reference's single-process solver stage
  * (`highmemory` queue, `backend/entityservice/tasks/solver.py`).
  *
  * Join-based formulation (no collect_set — a high-degree node never has
  * to fit its neighbor list in memory): per-node minima are computed with
  * a groupBy/min and joined back, so both steps are plain shuffles that
  * AQE can size. Converges in O(log n) rounds.
  */
object ConnectedComponents {

  /** @param edges distinct undirected edges as (u, v) node-id pairs,
    *              self-loops allowed (ignored).
    * @return (node, component) — component = min node id reachable; every
    *         node appearing in the input is assigned (including isolated
    *         representatives mapping to themselves).
    */
  def run(edges: Dataset[(Long, Long)], maxIterations: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    var cur = edges.toDF("u", "v")
      .where($"u" =!= $"v")
      .select(least($"u", $"v").as("v"), greatest($"u", $"v").as("u"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // isolated nodes (possible once filters drop edges) handled by caller

    var converged = false
    var iter = 0
    var prevSig: (Long, String) = (-1L, "")
    while (!converged && iter < maxIterations) {
      val small = smallStar(largeStar(cur))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // signature = (|E|, sum of row hashes): cheap fixpoint detection
      // decimal sum: overflow-free under ANSI mode
      val sigRow = small.agg(
        count(lit(1)).cast("long"),
        coalesce(sum(xxhash64($"u", $"v").cast("decimal(28,0)")), lit(0))
          .cast("string")).as[(Long, String)].head()
      converged = sigRow == prevSig
      prevSig = sigRow
      cur.unpersist()
      // break lineage growth across iterations
      cur = small.localCheckpoint(true)
      small.unpersist()
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIterations iterations")

    // At fixpoint every edge is (member, componentMin); add the roots.
    val assign = cur.select($"u".as("node"), $"v".as("component"))
      .union(cur.select($"v".as("node"), $"v".as("component")))
      .distinct()
    assign
  }

  /** large-star: connect every strictly-larger neighbor of u to the
    * minimum of u's neighborhood (incl. u). */
  private def largeStar(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val sym = e.select($"u", $"v").union(e.select($"v".as("u"), $"u".as("v")))
    val mins = sym.groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))
    sym.join(mins, "u")
      .where($"v" > $"u")
      .select($"v".as("u"), $"m".as("v"))
      .where($"u" =!= $"v")
      .distinct()
  }

  /** small-star: for each node u (edges oriented u > v), connect all of
    * u's smaller neighbors and u itself to the minimum neighbor. */
  private def smallStar(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val o = e.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      .where($"u" =!= $"v")
    val mins = o.groupBy($"u").agg(min($"v").as("m"))
    val withM = o.join(mins, "u")
    val nbrEdges = withM.where($"v" =!= $"m").select($"v".as("u"), $"m".as("v"))
    // selfEdges duplicates collapse in the final distinct below
    val selfEdges = withM.select($"u", $"m".as("v"))
    nbrEdges.union(selfEdges)
      .select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      .distinct()
  }
}
