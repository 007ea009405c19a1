package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Strongly connected components of a DIRECTED graph — the web-graph
  * companion to [[ConnectedComponents]] (which ignores direction): a
  * crawl link graph's SCC structure (the bowtie core, in/out tendrils)
  * is the standard macro readout before rank propagation, and mutual-
  * reachability clusters are the directed analogue of the reference's
  * match groups.
  *
  * Algorithm: iterative trim + forward-backward coloring (the FW-BW /
  * ColorSCC family — Fleischer et al. IPDPS 2000; the same scheme
  * GraphX's SCC uses). Each round over the unresolved subgraph:
  *
  *   0. TRIM  — nodes with no in-edge or no out-edge in the unresolved
  *      subgraph cannot sit on a cycle and resolve as singleton SCCs;
  *      iterated, this peels whole DAG tendrils (most of a web graph's
  *      mass) without paying a flood for them.
  *   1. COLOR — propagate c(v) = min id that reaches v (min-label
  *      flooding along edge direction to fixpoint). Every color class
  *      has its pivot (the node that IS its color) inside it.
  *   2. MARK  — from each pivot, flood BACKWARD through same-colored
  *      nodes: v is marked iff v can reach its pivot through its own
  *      color class. Marked nodes form EXACTLY the pivot's SCC (v↔pivot
  *      mutually reachable, and mutual reachability never leaves a
  *      color class: every node on a v↔pivot cycle is reached by the
  *      color and reaches v, hence shares it).
  *   3. RESOLVE — marked nodes take scc = color; the rest (nodes whose
  *      color class they cannot cycle back to) go to the next round with
  *      the resolved nodes' edges dropped.
  *
  * Scale shape: every step is a plain equi-join + min-agg (no neighbor
  * lists in memory, no closure materialization); rounds are
  * O(#DAG-layers) worst case but ≥ one SCC per color class resolves per
  * round, and propagation is O(diameter) joins with lineage truncated by
  * localCheckpoint — the same driver-loop discipline as
  * [[ConnectedComponents]] and BFS. Fixpoint checks are scalar counts.
  *
  * @param edges directed (src, dst) pairs; self-loops ignored.
  * @return (id, scc) for every node appearing in the input, scc = the
  *         minimum node id in the component. */
object Scc {

  def run(edges: DataFrame, maxRounds: Int = 50,
      maxPropagations: Int = 500): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val e0 = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val allNodes = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var remaining = allNodes
    var e = e0
    var resolved: DataFrame = spark.emptyDataFrame
      .select(lit(0L).as("id"), lit(0L).as("scc")).limit(0)
    var props = 0
    var round = 0
    var remCount = remaining.count()

    while (remCount > 0 && round < maxRounds) {
      round += 1
      // ---- 0. TRIM: a node with no in-edge or no out-edge inside the
      // unresolved subgraph cannot sit on a cycle — it IS its own SCC.
      // Iterating the trim peels whole DAG tendrils (most of a web
      // graph's mass) without ever paying a flood for them.
      var trimmedSome = true
      while (trimmedSome && props < maxPropagations) {
        props += 1
        val keep = remaining
          .join(e.select(col("src").as("id")).distinct(), Seq("id"),
            "left_semi")
          .join(e.select(col("dst").as("id")).distinct(), Seq("id"),
            "left_semi")
          .localCheckpoint(true)
        val dropped = remaining.join(keep, Seq("id"), "left_anti")
          .localCheckpoint(true)
        val nDropped = dropped.count()
        trimmedSome = nDropped > 0
        if (trimmedSome) {
          resolved = resolved.union(
            dropped.select(col("id"), col("id").as("scc")))
          val nextE = e
            .join(keep.select(col("id").as("src")), "src")
            .join(keep.select(col("id").as("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(true)
          if (remaining ne allNodes) remaining.unpersist()
          if (e ne e0) e.unpersist()
          remaining = keep
          e = nextE
        }
      }
      remCount = remaining.count()
      if (remCount == 0) {
        e0.unpersist(); allNodes.unpersist()
        return resolved
      }

      // ---- 1. COLOR: min-label flood along edge direction ----
      var color = remaining.select(col("id"), col("id").as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var changed = 1L
      while (changed > 0 && props < maxPropagations) {
        props += 1
        val minIn = e
          .join(color.select(col("id").as("src"), col("c").as("cs")), "src")
          .groupBy(col("dst").as("id")).agg(min("cs").as("min_in"))
        val next = color.join(minIn, Seq("id"), "left")
          .select(col("id"),
            least(col("c"), coalesce(col("min_in"), col("c"))).as("c"))
          .localCheckpoint(false)
        changed = next.join(color.withColumnRenamed("c", "c_old"), "id")
          .where(col("c") =!= col("c_old")).count()
        color.unpersist()
        color = next.persist(StorageLevel.MEMORY_AND_DISK)
      }
      require(changed == 0,
        s"SCC color flood did not converge within $maxPropagations joins")

      // ---- 2. MARK: backward flood from pivots through same color ----
      // edge v→w lets v join the marked set iff w is marked AND v, w
      // share a color (mutual reachability cannot leave a color class)
      val eCol = e
        .join(color.select(col("id").as("src"), col("c").as("c_src")), "src")
        .join(color.select(col("id").as("dst"), col("c").as("c_dst")), "dst")
        .where(col("c_src") === col("c_dst"))
        .select(col("src"), col("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var marked = color.where(col("id") === col("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var grew = 1L
      while (grew > 0 && props < maxPropagations) {
        props += 1
        val newly = eCol
          .join(marked.select(col("id").as("dst")), "dst")
          .select(col("src").as("id")).distinct()
          .join(marked, Seq("id"), "left_anti")
          .join(color, "id")
          .localCheckpoint(false)
        grew = newly.count()
        if (grew > 0) {
          val next = marked.union(newly)
            .persist(StorageLevel.MEMORY_AND_DISK)
          marked.unpersist()
          marked = next
        }
      }
      require(grew == 0,
        s"SCC backward flood did not converge within $maxPropagations joins")

      // ---- 3. RESOLVE ----
      val solved = marked.select(col("id"), col("c").as("scc"))
        .localCheckpoint(true)
      resolved = resolved.union(solved)
      val nextRemaining = remaining
        .join(solved.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(true)
      val nextE = e
        .join(nextRemaining.select(col("id").as("src")), "src")
        .join(nextRemaining.select(col("id").as("dst")), "dst")
        .select("src", "dst")
        .localCheckpoint(true)
      color.unpersist(); eCol.unpersist(); marked.unpersist()
      if (remaining ne allNodes) remaining.unpersist()
      if (e ne e0) e.unpersist()
      remaining = nextRemaining
      e = nextE
      remCount = remaining.count()
    }
    require(remCount == 0, s"SCC did not resolve in $maxRounds rounds")
    e0.unpersist(); allNodes.unpersist()
    resolved
  }
}
