package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank over a directed edge list in EXACT integer
  * arithmetic — the graph-centrality companion to
  * [[ConnectedComponents]] for ranking near-duplicate / co-occurrence
  * graphs (e.g. pick the most central document of a near-dup cluster as
  * its representative instead of min-id).
  *
  * Ranks are scaled longs (`scale` = rank 1.0) and every division is
  * floored (`DIV`), so the result is bit-identical at any partitioning
  * and any parallelism — floating-point PageRank sums in shuffle order
  * and never hashes stably across engines; this formulation is what lets
  * the driver oracle replay 3 full iterations in DuckDB as chained CTEs
  * (`//` there == `DIV` here). Per iteration, with damping d = 85/100:
  *
  *   contrib(e)  = rank(src) DIV outdeg(src)        per out-edge
  *   rank'(node) = (scale·15) DIV 100 + (85 · Σ contrib_in) DIV 100
  *
  * Dangling nodes (no out-edges) keep receiving but distribute nothing —
  * their mass is dropped rather than redistributed, which is fine for the
  * diagnostic rankings this feeds and keeps every term local to an edge.
  *
  * Scale shape: one static (src, dst, outdeg) edge table persisted up
  * front; each iteration is one shuffle join (edges × ranks on src — both
  * sides hash-partitioned on the key) plus one partial-aggregated
  * groupBy(dst). Integer sums map-side-combine exactly. Lineage is
  * truncated per round with localCheckpoint, same discipline as the CC
  * star rounds.
  */
object PageRank {

  /** @param edges distinct directed (src, dst) pairs, self-loops allowed
    *              on input (dropped).
    * @return (id, rank) for every node appearing in the edge list. */
  def run(edges: DataFrame, iters: Int = 3,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && scale >= 100L)
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("deg"))
    val e = e0.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = (scale * 15L) / 100L
    var ranks = nodes.withColumn("rank", lit(scale))
    for (i <- 1 to iters) {
      val contribs = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank DIV deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr("(coalesce(s, 0) * 85) DIV 100")).as("rank"))
      if (i < iters) ranks = ranks.localCheckpoint(eager = false)
    }
    ranks
  }

  /** Personalized PageRank (random walk with restart): the restart mass
    * lands ONLY on the seed set, so ranks measure proximity TO THE SEEDS
    * rather than global centrality — the crawl-frontier prioritiser
    * ("how close is this unfetched page to my trusted seed list") and
    * the seed-expansion primitive for growing a labeled dup-cluster.
    * Same exact scaled-long arithmetic, floored divisions, and one-
    * shuffle-join-per-iteration shape as [[run]]; seeds init at `scale`,
    * everything else at 0, so unreachable nodes stay exactly 0. */
  def runPersonalized(edges: DataFrame, seeds: DataFrame, iters: Int = 3,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && scale >= 100L)
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("deg"))
    val e = e0.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val seedSet = seeds.select(col("node").cast("long").as("id")).distinct()
    val nodes = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct()
      .join(seedSet.withColumn("isSeed", lit(1L)), Seq("id"), "left")
      .select(col("id"), coalesce(col("isSeed"), lit(0L)).as("isSeed"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = (scale * 15L) / 100L
    var ranks = nodes.select(col("id"), (col("isSeed") * scale).as("rank"))
    for (i <- 1 to iters) {
      val contribs = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank DIV deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (col("isSeed") * base + expr("(coalesce(s, 0) * 85) DIV 100"))
            .as("rank"))
      if (i < iters) ranks = ranks.localCheckpoint(eager = false)
    }
    ranks
  }
}
