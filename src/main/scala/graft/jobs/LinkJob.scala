package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ClusterMember, Edge, LinkConfig}
import graft.ingest.{Ingest, Page, PagesSynth}
import graft.io.Checkpoint
import graft.link.Linker
import graft.cluster.Solver

/** The resumable end-to-end linkage run (SURVEY.md §3.2 Spark equivalent),
  * spark-submit entry point included. Stage graph:
  *
  *   blocked  (pages -> extract -> CLK encode -> LSH blocks)
  *   edges    (blocked self-join -> dice -> threshold -> dedup)
  *   clusters (CC -> per-component greedy solve)
  *
  * Each stage commits to `<root>/<stage>` via Checkpoint (manifest-last
  * protocol, per-partition lineage + counters). Rerunning the job after a
  * crash resumes from the last committed stage; recomputing an upstream
  * stage invalidates everything downstream (lineage correctness).
  */
object LinkJob {

  val Stages = Seq("blocked", "edges", "clusters")

  def run(spark: SparkSession, pages: Dataset[Page], cfg: LinkConfig,
      root: String): DataFrame = {
    var dirty = false

    def chained(name: String, counters: DataFrame => Map[String, Long] = _ => Map.empty)
        (compute: => DataFrame): DataFrame = {
      if (dirty) Checkpoint.invalidate(spark, root, name)
      val r = Checkpoint.stage(spark, root, name, counters)(compute)
      if (!r.resumed) dirty = true
      r.df
    }

    val blocked = chained("blocked") {
      Ingest.encodeAndBlock(pages)
    }

    val edges = chained("edges", written => {
      // north-rule counters: generated == scored (threshold applied in the
      // same codegen stage, nothing is materialized below threshold);
      // kept = committed rows
      val total = Linker.totalComparisons(blocked)
      Map(
        "pairs_generated" -> total,
        "pairs_scored" -> total,
        "edges_kept" -> written.count())
    }) {
      import spark.implicits._
      val e = Linker.scoreCandidates(blocked, cfg)
      e.toDF()
    }

    // guardrail (A4): enforced on the committed edge count
    val edgeCount = edges.count()
    require(edgeCount <= cfg.maxScoredPairs,
      s"run aborted: $edgeCount candidate pairs exceeds cap ${cfg.maxScoredPairs}")
    require(edgeCount <= cfg.maxSolverPairs,
      s"solver aborted: $edgeCount pairs exceeds cap ${cfg.maxSolverPairs}")

    chained("clusters") {
      import spark.implicits._
      Solver.solve(edges.as[Edge], cfg).toDF()
    }
  }

  /** spark-submit entry: LinkJob <checkpointRoot> <nA> <nB> <threshold>.
    * Synthesizes the page corpus deterministically (no external data) and
    * runs the full resumable pipeline. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: LinkJob <checkpointRoot> <nA> <nB> <threshold> [cores]")
    val Array(root, nA, nB, threshold) = args.take(4)
    val cores = if (args.length > 4) args(4) else "8"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cores]"))
      .appName("graft-link")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = PagesSynth.pages(spark, Seq(nA.toInt, nB.toInt))
    val clusters = run(spark, pages, LinkConfig(threshold.toDouble), root)
    println(s"clusters=${clusters.count()}")
    Checkpoint.lineage(spark, root).groupBy("stage")
      .agg(count(lit(1)).as("partitions"), sum("rows_out").as("rows"))
      .orderBy("stage").show(false)
    spark.stop()
  }
}
