package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration HITS (Kleinberg's hubs & authorities) over a directed
  * edge list in EXACT integer arithmetic — the web-graph companion to
  * [[PageRank]]: PageRank ranks by endorsement flow, HITS separates
  * "pages that point at good content" (hubs — crawl seed lists, link
  * directories) from "content worth pointing at" (authorities), the
  * classic signal pair for prioritising a crawl frontier.
  *
  * Same exact-arithmetic discipline as [[PageRank]]: scores are scaled
  * longs and the per-round normalisation divides by the round's MAX raw
  * score with floored division (`DIV` == DuckDB `//`) instead of the
  * textbook L2 norm — sqrt is not exactly replayable across engines,
  * max-normalisation is, and it preserves the ranking (both are positive
  * scalings). Results are bit-identical at any parallelism and replay in
  * SQL as chained CTEs.
  *
  * Scale shape: the deduped edge list is persisted once; each iteration
  * is two shuffle joins (edges × scores on src / dst, both
  * hash-partitioned on the key) + two partial-aggregated groupBys; the
  * per-round max is a 1-row aggregate broadcast back via crossJoin.
  * Raw sums are exact under map-side combine and ACCUMULATE in
  * decimal(38,0) (v is widened before the sum, not after), so neither
  * a 10^12-in-degree node's raw score nor the subsequent scale
  * multiply can wrap the long range.
  */
object Hits {

  /** @param edges directed (src, dst) pairs; duplicates collapse,
    *              self-loops participate like any edge.
    * @return (node, hub, auth) for every node in the edge list, scores
    *         in [0, scale] with max-normalisation per round. */
  def run(edges: DataFrame, iters: Int = 2,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && scale >= 100L)
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    /** (node, raw) → (node, v): coalesced max-normalised score over ALL
      * nodes (missing raw = no contributing edges = 0). */
    def normalized(raw: DataFrame): DataFrame = {
      val mx = raw.agg(max(col("raw")).as("mx"))
      nodes.join(raw, Seq("node"), "left").crossJoin(mx)
        .select(col("node"), coalesce(
          expr(s"CAST(raw AS DECIMAL(38,0)) * ${scale}L DIV mx"),
          lit(0L)).as("v"))
    }

    var hub = nodes.withColumn("v", lit(scale))
    var auth: DataFrame = null
    for (i <- 1 to iters) {
      // sum in decimal(38,0), not Long: with scaled scores v <= scale,
      // an in-degree above ~9.2e12 would wrap the raw Long sum before
      // the decimal widening in normalized()
      auth = normalized(
        e.join(hub.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), col("v"))
          .groupBy("node")
          .agg(sum(col("v").cast("decimal(38,0)")).as("raw")))
      hub = normalized(
        e.join(auth.withColumnRenamed("node", "dst"), "dst")
          .select(col("src").as("node"), col("v"))
          .groupBy("node")
          .agg(sum(col("v").cast("decimal(38,0)")).as("raw")))
      if (i < iters) {
        auth = auth.localCheckpoint(eager = false)
        hub = hub.localCheckpoint(eager = false)
      }
    }
    hub.withColumnRenamed("v", "hub")
      .join(auth.withColumnRenamed("v", "auth"), "node")
  }
}
