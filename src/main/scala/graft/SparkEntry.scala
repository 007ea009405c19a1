package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.LinkConfig
import graft.ingest.ClkIO
import graft.link.{Linker, Pipeline}
import graft.cluster.Solver

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private val FixturesDir = "/root/repo/fixtures"

  private def febrl4Blocked(spark: SparkSession): DataFrame = {
    val a = ClkIO.readBinary(spark, s"$FixturesDir/febrl4_a.bin", 0, 128)
    val b = ClkIO.readBinary(spark, s"$FixturesDir/febrl4_b.bin", 1, 128)
    Pipeline.defaultBlock(a.union(b))
  }

  /** Flagship: the full record-linkage run (encode fixtures → block →
    * dice-score → threshold → dedup → CC → greedy solve → clusters).
    * Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.clusters(febrl4Blocked(spark), LinkConfig(threshold = 0.8)).toDF()

  /** One per implemented operator from SURVEY.md §2. Queries without an
    * oracleSql entry get a rows-only check (non-SQL-expressible ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1+B4+A2+A3: blocking join + dice scoring + threshold + dedup
    "er_febrl4_edges" -> ((s, _) =>
      Pipeline.edges(febrl4Blocked(s), LinkConfig(threshold = 0.8))
        .toDF().orderBy(desc("sim"), col("rec0"), col("rec1"))),
    // G1: greedy entity groups (exact-oracle-tested in LinkageFixtureSpec)
    "er_febrl4_clusters" -> ((s, _) =>
      Pipeline.clusters(febrl4Blocked(s), LinkConfig(threshold = 0.8))
        .toDF().orderBy(col("clusterId"), col("dp"))),
    // M1+M2: deterministic permutation + mask (2-party result type)
    "er_febrl4_permutation" -> ((s, _) => {
      val clusters = Pipeline.clusters(febrl4Blocked(s), LinkConfig(threshold = 0.8))
      val (perm, _) = graft.cluster.Permutation.permuteAndMask(clusters, 1000, 1000)
      perm.orderBy(col("dp"), col("row_index"))
    }),
    // Full web-corpus pipeline: synthesize pages -> extract/encode CLK ->
    // MinHash-LSH blocking -> dice -> threshold -> CC -> greedy groups
    "er_pages_clusters" -> ((s, _) => {
      val pages = graft.ingest.PagesSynth.pages(s, Seq(1000, 1000))
      val blocked = graft.ingest.Ingest.encodeAndBlock(pages)
      Pipeline.clusters(blocked, LinkConfig(threshold = 0.8))
        .toDF().orderBy(col("clusterId"), col("dp"))
    }),
    // B2+B3: block metadata aggregation over the LSH-blocked corpus
    "er_pages_block_stats" -> ((s, _) => {
      val pages = graft.ingest.PagesSynth.pages(s, Seq(1000, 1000))
      val blocked = graft.ingest.Ingest.encodeAndBlock(pages)
      graft.ingest.Blocking.blockStats(blocked)
        .orderBy(col("dp"), col("block_key"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
