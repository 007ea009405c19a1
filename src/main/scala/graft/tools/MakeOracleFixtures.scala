package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ingest.ClkIO

/** One-shot generator for `fixtures/febrl4_clks.parquet` — the febrl4 CLK
  * fixtures re-encoded as (dp int, entity_id bigint, pc int,
  * words array<bigint> = 16 little-endian longs per 128-byte CLK) so the
  * driver's DuckDB oracle can replay the Dice kernel with
  * `bit_count(a.words[i] & b.words[i])` (the reference's own correctness
  * gate is exact score equality,
  * `e2etests/tests/test_results_correctness.py:53-62`). Popcount and AND
  * are byte-order-invariant, so the long packing choice is free as long
  * as both join sides read the same parquet — they do.
  *
  * Committed output; rerun only if the .bin fixtures ever change:
  *   sbt -batch "runMain graft.tools.MakeOracleFixtures"
  */
object MakeOracleFixtures {

  def words(clk: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(clk).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(clk.length / 8)(bb.getLong())
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // fixtures/test_encodings_blocks.json — the third upload wire format
    // ("encodings" + external "blocks" map, views/util.py:18-33). Twelve
    // CLKs from the febrl4 dp=0 dump; the map deliberately covers only ids
    // 0..9 (the reference DROPS uncovered encodings) and mixes 1- and
    // 2-block memberships. Deterministic: same .bin in -> same json out.
    // Regenerate alone with `runMain graft.tools.MakeOracleFixtures json`.
    {
      val first12 = ClkIO.readBinary(spark, "/root/repo/fixtures/febrl4_a.bin", 0, 128)
        .filter(_.entityId < 12).collect().sortBy(_.entityId)
      val encJson = first12.map(r =>
          "    \"" + java.util.Base64.getEncoder.encodeToString(r.clk) + "\"")
        .mkString(",\n")
      val blockJson = (0 until 10).map { i =>
        val bs = if (i % 3 == 0) Seq(s"b${i % 4}", "shared") else Seq(s"b${i % 4}")
        s"""    "$i": [${bs.map("\"" + _ + "\"").mkString(", ")}]"""
      }.mkString(",\n")
      val dest = java.nio.file.Paths.get("/root/repo/fixtures/test_encodings_blocks.json")
      java.nio.file.Files.write(dest,
        s"{\n  \"encodings\": [\n$encJson\n  ],\n  \"blocks\": {\n$blockJson\n  }\n}\n"
          .getBytes("UTF-8"))
      println(s"wrote $dest (${java.nio.file.Files.size(dest)} bytes)")
      if (args.headOption.contains("json")) { spark.stop(); return }
    }

    val a = ClkIO.readBinary(spark, "/root/repo/fixtures/febrl4_a.bin", 0, 128)
    val b = ClkIO.readBinary(spark, "/root/repo/fixtures/febrl4_b.bin", 1, 128)

    // Frozen greedy-solver output as parquet (see the uses below for the
    // circularity caveat). clusterId = min packed member NodeId, so the
    // output is partitioning-invariant.
    def freezeClusters(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmpDir = s"/tmp/graft_make_fixture_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmpDir)
      val p = new java.io.File(tmpDir).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val d = java.nio.file.Paths.get(s"/root/repo/fixtures/$name.parquet")
      java.nio.file.Files.copy(p.toPath, d,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"wrote $d (${java.nio.file.Files.size(d)} bytes)")
    }

    // Golden clusters at t=0.75 — the threshold where the pipeline clears
    // the BASELINE pairwise-F1 >= 0.99 gate (LinkageFixtureSpec); feeds
    // q_febrl4_eval's DuckDB replay. Regenerate alone with
    // `runMain graft.tools.MakeOracleFixtures t075`.
    freezeClusters(
      graft.link.Pipeline.clusters(
        graft.link.Pipeline.defaultBlock(a.union(b)),
        graft.core.LinkConfig(threshold = 0.75)).toDF(),
      "febrl4_golden_clusters_t075")
    if (args.headOption.contains("t075")) { spark.stop(); return }

    val tmp = "/tmp/graft_make_fixture"
    a.union(b)
      .map(r => (r.dp, r.entityId, r.popcount, words(r.clk)))
      .toDF("dp", "entity_id", "pc", "words")
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp)

    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dest = java.nio.file.Paths.get("/root/repo/fixtures/febrl4_clks.parquet")
    java.nio.file.Files.copy(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $dest (${java.nio.file.Files.size(dest)} bytes)")

    // Golden 5-party groups at t=0.8 — frozen output of THIS repo's own
    // solver (mirrors the reference gate
    // `e2etests/tests/test_results_correctness_multiparty.py:15-45`, which
    // freezes anonlink's output). Deliberately circular on the day it was
    // generated; its value is as a regression trap for any later change to
    // the kernel / CC / greedy solver. Groups are canonicalized by
    // (clusterId, dp, entityId).
    val parties = (0 until 5).map { k =>
      ClkIO.readBinary(spark, s"/root/repo/fixtures/multiparty_$k.bin", k, 128)
    }.reduce(_ union _)
    val clusters = graft.link.Pipeline.clusters(
      graft.link.Pipeline.defaultBlock(parties),
      graft.core.LinkConfig(threshold = 0.8))
      .collect().sortBy(c => (c.clusterId, c.dp, c.entityId))
    val lines = "clusterId,dp,entityId" +:
      clusters.map(c => s"${c.clusterId},${c.dp},${c.entityId}")
    val goldenDest = java.nio.file.Paths.get(
      "/root/repo/fixtures/multiparty_golden_groups.csv")
    java.nio.file.Files.write(goldenDest,
      String.join("\n", lines: _*).getBytes("UTF-8"))
    println(s"wrote $goldenDest (${clusters.length} member rows)")

    // Frozen greedy-solver outputs as parquet, so the driver's DuckDB
    // oracle can gate er_febrl4_clusters / er_pages_clusters (sequential
    // greedy is not SQL-expressible). DELIBERATELY CIRCULAR on the day of
    // generation — these pin regression, not first-principles correctness;
    // the semantic gates remain LinkageFixtureSpec's exact brute-force
    // oracle and the frozen multiparty golden above. clusterId = min
    // packed member NodeId, so the output is partitioning-invariant.
    freezeClusters(
      graft.link.Pipeline.clusters(
        graft.link.Pipeline.defaultBlock(a.union(b)),
        graft.core.LinkConfig(threshold = 0.8)).toDF(),
      "febrl4_golden_clusters")
    freezeClusters(
      graft.link.Pipeline.clusters(
        graft.ingest.Ingest.encodeAndBlock(
          graft.ingest.PagesSynth.pages(spark, Seq(1000, 1000))),
        graft.core.LinkConfig(threshold = 0.8)).toDF(),
      "pages_golden_clusters")
    spark.stop()
  }
}
