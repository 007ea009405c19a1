package graft.cluster

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core decomposition by iterative peeling: repeatedly drop nodes of
  * degree < k until the remaining subgraph has min degree ≥ k. The
  * k-core is UNIQUE (independent of peel order), so the fixpoint is
  * deterministic at any parallelism — which also makes it replayable as
  * a fixed chain of SQL rounds (extra rounds past convergence are
  * no-ops).
  *
  * In a web-entity graph the k-core separates organically-linked hub
  * structure from pendant noise (link/spam farms peel away; Seidman,
  * "Network structure and minimum degree", 1983).
  *
  * Scale shape per round: ONE map-side-combining degree aggregate and
  * two left-semi joins on the node key — all hash-partitioned by the
  * same key, so AQE reuses the exchange; the round's result is
  * localCheckpoint'ed (lazy) to keep lineage flat, and the edge count
  * that materializes it doubles as the fixpoint test. Rounds needed =
  * peel depth (degeneracy layers), typically ≤ ~10 on web-like graphs.
  */
object KCore {

  /** @param edges undirected edges (self-loops ignored, duplicates fine)
    * @return surviving (node, deg) — degree WITHIN the k-core. Empty
    *         when no k-core exists. Fails if `maxRounds` peels don't
    *         converge (raise it for pathological chain graphs). */
  def run(edges: Dataset[(Long, Long)], k: Int,
      maxRounds: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val undirected = edges.toDF("u", "v")
      .where($"u" =!= $"v")
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .distinct()
    var sym = undirected.select($"u", $"v")
      .unionByName(undirected.select($"v".as("u"), $"u".as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var n = sym.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val keep = sym.groupBy("u").agg(count(lit(1)).as("d"))
        .where($"d" >= k).select("u")
      val next = sym
        .join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(false)
      val n1 = next.count()
      converged = n1 == n
      sym.unpersist()
      sym = next
      n = n1
      rounds += 1
    }
    require(converged, s"k-core did not converge in $maxRounds rounds")
    sym.groupBy($"u".as("node")).agg(count(lit(1)).as("deg"))
      .select($"node", $"deg")
  }
}
