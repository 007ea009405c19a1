package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bowtie decomposition of a directed graph (Broder et al., WWW 2000,
  * "Graph structure in the Web") — the macro structure readout of a
  * crawl snapshot: the giant strongly connected CORE, the IN set that
  * reaches it, the OUT set it reaches, TENDRILs hanging off the weakly
  * connected mass, and the DISCONNECTED remainder. The class balance is
  * the first thing a crawl health check reads (an OUT-heavy snapshot
  * means frontier starvation; a swollen DISCONNECTED slice means seed
  * coverage gaps).
  *
  * Built from primitives this module already trusts: [[Scc]] finds the
  * components (core = largest SCC, ties to the smallest label),
  * frontier-only reachability floods give fwd/bwd closure from the core
  * (each hop ONE equi-join of the frontier — never the visited set —
  * against the edge table), and [[ConnectedComponents]] supplies weak
  * connectivity. A non-core node can never sit in both fwd and bwd
  * (mutual reachability with the core would put it IN the core), so the
  * classes are a partition by construction.
  *
  * Driver-side state: two single-value collects (the core label and the
  * core's weak-component id). Everything else stays distributed.
  *
  * @param edges directed (src, dst); self-loops ignored.
  * @return (id, cls) with cls ∈ core | in | out | tendril |
  *         disconnected, for every node in the input. */
object Bowtie {

  def classify(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()

    val scc = Scc.run(e).localCheckpoint(true)
    val coreLabel = scc.groupBy("scc").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("scc")).limit(1)
      .select("scc").as[Long].head()
    val core = scc.where(col("scc") === coreLabel).select("id")
      .localCheckpoint(true)

    val fwd = reach(e, core)
    val bwd = reach(e.select(col("dst").as("src"), col("src").as("dst")),
      core)
    // weak connectivity: the SCC label is the min id of the core, hence
    // itself a core member — one scalar lookup gives the component id
    val wcc = ConnectedComponents.run(e.as[(Long, Long)])
      .localCheckpoint(true)
    val coreComp = wcc.where(col("node") === coreLabel)
      .select("component").as[Long].head()

    nodes
      .join(core.withColumn("is_core", lit(1)), Seq("id"), "left")
      .join(fwd.withColumn("is_fwd", lit(1)), Seq("id"), "left")
      .join(bwd.withColumn("is_bwd", lit(1)), Seq("id"), "left")
      .join(wcc.select(col("node").as("id"), col("component")), Seq("id"),
        "left")
      .select(col("id"),
        when(col("is_core") === 1, "core")
          .when(col("is_bwd") === 1, "in")
          .when(col("is_fwd") === 1, "out")
          .when(col("component") === coreComp, "tendril")
          .otherwise("disconnected").as("cls"))
  }

  /** Unbounded multi-source reachability: flood until the frontier dries
    * up. Per hop: ONE frontier-vs-edges equi-join + one anti-join vs the
    * visited set, lineage truncated per round. */
  private def reach(e: DataFrame, seeds: DataFrame): DataFrame = {
    var visited = seeds.select(col("id")).distinct().localCheckpoint(true)
    var frontier = visited
    var grew = frontier.count()
    while (grew > 0) {
      val next = frontier.join(e, col("id") === col("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint(true)
      grew = next.count()
      if (grew > 0) {
        visited = visited.union(next).localCheckpoint(true)
        frontier = next
      }
    }
    visited
  }
}
